package graft

/** Dev bookkeeping: prints declared / oracled / no-oracle query counts so
  * SURVEY §8/§13 arithmetic can be audited against the registries. */
object CountQueries {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"declared=${q.size} oracled=${o.size} no_oracle=${(q -- o).size}")
    println("no-oracle: " + (q -- o).toSeq.sorted.mkString(", "))
    val orphans = o -- q
    if (orphans.nonEmpty) println("ORPHAN ORACLES: " + orphans.mkString(", "))
  }
}

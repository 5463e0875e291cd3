package graft

/** Dev tool: print the formatted physical plan of named queries.
  * Usage: runMain graft.Explain <sfDir> <q1,q2,...> [substringToCount...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val spark = Sessions.local("graft-explain")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"===== $n =====")
      df.explain("formatted")
      val plan = df.queryExecution.executedPlan.toString
      Seq("Expand", "Exchange", "BroadcastHashJoin", "SortMergeJoin",
        "WholeStageCodegen", "PushedFilters").foreach { k =>
        println(s"[count] $n $k = ${k.r.findAllIn(plan).length}")
      }
    }
    spark.stop()
  }
}

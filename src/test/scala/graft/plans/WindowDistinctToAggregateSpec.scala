package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowDistinctToAggregateSpec extends SparkSpec {

  private lazy val df: DataFrame = {
    import spark.implicits._
    Seq((1, "a", 10.0), (1, "b", 20.0), (2, "c", 30.0))
      .toDF("k", "v", "x")
  }

  private def hasWindow(d: DataFrame): Boolean =
    d.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  test("rewrites the full-partition window + distinct idiom to one aggregate") {
    import spark.implicits._
    val w = Window.partitionBy($"k")
    val idiom = df
      .withColumn("mx", max($"x").over(w))
      .withColumn("cnt", count($"v").over(w))
      .select($"k", $"mx", $"cnt").distinct()
    assert(!hasWindow(idiom), "Window should be rewritten away")
    val got = idiom.orderBy($"k").as[(Int, Double, Long)].collect().toSeq
    assert(got == Seq((1, 20.0, 2L), (2, 30.0, 1L)))
  }

  test("does not fire when the window is ordered (running agg semantics)") {
    import spark.implicits._
    val w = Window.partitionBy($"k").orderBy($"x")
    val run = df.withColumn("rs", sum($"x").over(w))
      .select($"k", $"rs").distinct()
    assert(hasWindow(run), "ordered window must be preserved")
    val got = run.orderBy($"k", $"rs").as[(Int, Double)].collect().toSeq
    assert(got == Seq((1, 10.0), (1, 30.0), (2, 30.0))) // running sums
  }

  test("does not fire when a raw per-row column survives the projection") {
    import spark.implicits._
    val w = Window.partitionBy($"k")
    val mixed = df.withColumn("mx", max($"x").over(w))
      .select($"k", $"v", $"mx").distinct()
    assert(hasWindow(mixed), "per-row column v keeps distinct non-collapsing")
    assert(mixed.count() == 3)
  }

  test("does not fire when a partition key is projected away") {
    import spark.implicits._
    val w = Window.partitionBy($"k", $"v")
    val dropped = df.withColumn("mx", max($"x").over(w))
      .select($"k", $"mx").distinct()
    assert(hasWindow(dropped),
      "dropping partition key v changes distinct cardinality — must not rewrite")
    assert(dropped.count() == 3)
  }

  test("expression over the window result is folded into the aggregate") {
    import spark.implicits._
    val w = Window.partitionBy($"k")
    val idiom = df
      .withColumn("m2", round(sum($"x").over(w) / 10.0, 1))
      .select($"k", $"m2").distinct()
    assert(!hasWindow(idiom))
    val got = idiom.orderBy($"k").as[(Int, Double)].collect().toSeq
    assert(got == Seq((1, 3.0), (2, 3.0)))
  }
}

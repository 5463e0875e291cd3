package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The AQE half of the skew story (a1_salted_agg is the manual half):
  * a runtime-skewed sort-merge join must be SPLIT by AQE's
  * OptimizeSkewedJoin — the hot partition is divided into sub-partitions
  * matched against replicated right-side reads, so one straggler task
  * stops gating the stage. Thresholds are lowered to make a planted
  * test-sized hot key trip the same code path a 100 TB hot key would.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the skewed partition of a sort-merge join (skew=true)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force a shuffle join: broadcasting the small side would bypass
      // the skew-split path entirely
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~99% of the left side + a cold tail
      val left = spark.range(300000).select(lit(0L).as("k"), $"id".as("v"))
        .unionAll(spark.range(1000).select(($"id" + 1).as("k"), $"id".as("v")))
      val right = spark.range(1001).select($"id".as("k"), md5($"id".cast("string")).as("w"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's own query execution (a write/count spawns
      // a fresh QueryExecution and the inspected plan stays pre-AQE)
      joined.queryExecution.toRdd.foreachPartition(_ => ())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"),
        s"AQE plan did not finalize:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

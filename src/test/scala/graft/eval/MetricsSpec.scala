package graft.eval

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetricsSpec extends SparkSpec {

  test("classificationReport matches hand-computed confusion ratios") {
    import spark.implicits._
    // tp=2 fp=1 fn=1 tn=2
    val pred = Seq(
      (1.0, 1.0), (1.0, 1.0), (1.0, 0.0),
      (0.0, 1.0), (0.0, 0.0), (0.0, 0.0))
      .toDF("label", "prediction")
    val rep = Metrics.classificationReport(pred)
    assert(rep("accuracy") == 4.0 / 6)
    assert(rep("precision") == 2.0 / 3)
    assert(rep("recall") == 2.0 / 3)
    assert(rep("f1") == 2.0 / 3)
  }

  test("auc is 1.0 for perfectly separated scores and 0.0 when inverted") {
    import spark.implicits._
    val perfect = Seq(
      (1.0, Vectors.dense(0.1, 0.9)), (1.0, Vectors.dense(0.2, 0.8)),
      (0.0, Vectors.dense(0.8, 0.2)), (0.0, Vectors.dense(0.9, 0.1)))
      .toDF("label", "rawPrediction")
    assert(Metrics.auc(perfect) == 1.0)
    val inverted = perfect.withColumn("label", lit(1.0) - col("label"))
    assert(Metrics.auc(inverted) == 0.0)
  }

  test("positiveProb extracts element 1 of the probability vector (E3)") {
    import spark.implicits._
    val df = Seq(Tuple1(Vectors.dense(0.3, 0.7))).toDF("probability")
    val p = df.select(Metrics.positiveProb($"probability")).head().getDouble(0)
    assert(p == 0.7)
  }
}

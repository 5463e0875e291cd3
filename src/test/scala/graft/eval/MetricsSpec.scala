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

  test("calibration bins a calibrated score correctly and covers all rows") {
    import spark.implicits._
    // planted: in each of 4 probability levels, labels occur at exactly
    // the predicted rate → mean_prob == frac_pos per bin (calibrated)
    val rows = Seq.tabulate(400) { i =>
      val p = Seq(0.05, 0.35, 0.65, 0.95)(i % 4)
      val label = if ((i / 4) % 100 < p * 100) 1.0 else 0.0
      (label, p)
    }
    val cal = Metrics.calibration(rows.toDF("label", "prob1"))
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(cal.map(_._2).sum == 400L)
    assert(cal.map(_._1) == Seq(0, 3, 6, 9)) // floor(p*10)
    cal.foreach { case (bin, _, meanP, fracPos) =>
      assert(math.abs(meanP - fracPos) < 1e-9,
        s"bin $bin: mean_prob $meanP vs frac_pos $fracPos")
    }
    // prob exactly 1.0 must land in the LAST bin, not bin 10
    val edge = Metrics.calibration(Seq((1.0, 1.0)).toDF("label", "prob1"))
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(edge == Seq((9, 1L, 1.0, 1.0)))
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

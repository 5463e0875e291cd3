package graft.eval

import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation operators E1-E4 (reference: RF/utils.scala:49-86 and its
  * near-duplicate GBDT/spark/utils.scala:58-95).
  *
  * The reference converts to an RDD and uses MulticlassMetrics
  * (RF/utils.scala:50-51) — a DataFrame→RDD boundary that abandons
  * Catalyst. Here E2 is a single DataFrame aggregation (one shuffle-free
  * pass after predictions), and E3 uses the native `vector_to_array`
  * expression instead of the reference's udf (RF/utils.scala:83-86), so
  * the whole scoring path stays in whole-stage codegen.
  */
object Metrics {

  /** E3: positive-class probability from the ml `probability` vector. */
  def positiveProb(probabilityCol: Column): Column =
    vector_to_array(probabilityCol).getItem(1)

  /** E1: area under ROC from rawPrediction (RF/utils.scala:67-74). */
  def auc(predictions: DataFrame,
          labelCol: String = "label",
          rawCol: String = "rawPrediction"): Double =
    new BinaryClassificationEvaluator()
      .setLabelCol(labelCol)
      .setRawPredictionCol(rawCol)
      .setMetricName("areaUnderROC")
      .evaluate(predictions)

  /** E2: accuracy + positive-class precision/recall/F1 at threshold 0.5
    * (RF/utils.scala:49-57), as ONE aggregate pass — the four counts of
    * the confusion matrix are conditional sums, then driver-side ratios.
    */
  def classificationReport(predictions: DataFrame,
                           labelCol: String = "label",
                           predictionCol: String = "prediction"): Map[String, Double] = {
    val l = col(labelCol).cast("double")
    val p = col(predictionCol).cast("double")
    val row = predictions.agg(
      sum(when(l === 1.0 && p === 1.0, 1L).otherwise(0L)).as("tp"),
      sum(when(l === 0.0 && p === 1.0, 1L).otherwise(0L)).as("fp"),
      sum(when(l === 1.0 && p === 0.0, 1L).otherwise(0L)).as("fn"),
      sum(when(l === 0.0 && p === 0.0, 1L).otherwise(0L)).as("tn")
    ).head()
    val (tp, fp, fn, tn) =
      (row.getLong(0).toDouble, row.getLong(1).toDouble,
       row.getLong(2).toDouble, row.getLong(3).toDouble)
    val precision = if (tp + fp > 0) tp / (tp + fp) else 0.0
    val recall    = if (tp + fn > 0) tp / (tp + fn) else 0.0
    val f1 = if (precision + recall > 0) 2 * precision * recall / (precision + recall) else 0.0
    Map(
      "accuracy"  -> (if (tp + fp + fn + tn > 0) (tp + tn) / (tp + fp + fn + tn) else 0.0),
      "precision" -> precision,
      "recall"    -> recall,
      "f1"        -> f1)
  }

  /** Extension: calibration table — equal-width probability bins with
    * (count, mean predicted prob, observed positive rate) per bin. A
    * model is calibrated when mean_prob ≈ frac_pos bin-by-bin; AUC
    * alone cannot see miscalibration (it is rank-only). ONE aggregate
    * pass over the scored output — the bin column is a plain floor
    * expression, so partial aggregation applies at any scale. */
  def calibration(predictions: DataFrame,
                  bins: Int = 10,
                  labelCol: String = "label",
                  probCol: String = "prob1"): DataFrame = {
    val p = col(probCol).cast("double")
    predictions
      .withColumn("bin",
        least(floor(p * bins), lit(bins - 1)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        avg(p).as("mean_prob"),
        avg(col(labelCol).cast("double")).as("frac_pos"))
      .orderBy(col("bin"))
  }
}

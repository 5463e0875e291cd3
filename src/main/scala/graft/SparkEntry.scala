package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2 (plus
  * the LLM-data-pipeline extensions). Each takes (spark, sfDir) and reads
  * only the sfDir parquet tables. `oracleSql`: DuckDB-runnable ANSI SQL
  * over the same tables, hash-compared by the driver; omitted for non-SQL
  * ops.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("churn_wide_table")(spark, "/root/testdata/sf0.001")

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.queries ++
    graft.queries.Relational.queries ++
      graft.queries.Churn.queries ++
      graft.ml.ChurnML.queries ++
      graft.llm.TextOps.queries ++
      graft.llm.Bpe.queries ++
      graft.llm.Retrieval.queries ++
      graft.llm.CorpusPipeline.queries ++
      graft.llm.Dedup.queries ++
      graft.llm.Similarity.queries ++
      graft.llm.EventWindows.queries ++
      graft.llm.TemporalJoins.queries ++
      graft.encode.FeatIndex.queries ++
      graft.encode.Encoders.queries ++
      graft.io.Sinks.queries ++
      graft.io.Layout.queries ++
      graft.llm.Multimodal.queries ++
      graft.eval.Metrics.queries ++
      graft.streaming.StreamingWindows.queries

  val oracleSql: Map[String, String] =
    graft.queries.Analytics.oracles ++
    graft.queries.Relational.oracles ++
      graft.queries.Churn.oracles ++
      graft.ml.ChurnML.oracles ++
      graft.llm.TextOps.oracles ++
      graft.llm.Bpe.oracles ++
      graft.llm.Retrieval.oracles ++
      graft.llm.CorpusPipeline.oracles ++
      graft.llm.Dedup.oracles ++
      graft.llm.Similarity.oracles ++
      graft.llm.EventWindows.oracles ++
      graft.llm.TemporalJoins.oracles ++
      graft.encode.FeatIndex.oracles ++
      graft.encode.Encoders.oracles ++
      graft.io.Sinks.oracles ++
      graft.io.Layout.oracles ++
      graft.llm.Multimodal.oracles ++
      graft.eval.Metrics.oracles ++
      graft.streaming.StreamingWindows.oracles
}

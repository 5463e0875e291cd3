package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sparse keyword retrieval over the documents corpus — the BM25 twin of
  * the dense-embedding ANN family in [[Similarity]]. A training-data
  * pipeline needs both retrieval modes: dense for semantic near-dup /
  * curation, sparse for keyword-targeted corpus slicing ("pull every doc
  * about X for the eval set").
  *
  * Scale design (the inverted-index insight, re-expressed relationally):
  *  - Postings are RESTRICTED TO THE QUERY TERMS immediately after
  *    tokenization — the per-term tf/df aggregates run over only the
  *    matching postings, never the full token stream. At 100 TB the
  *    token explode is the scan-side map; the filter on query terms cuts
  *    the shuffle to (docs containing a query term) × (query terms).
  *  - df is a |query|-row table → broadcast. Corpus stats (N, avgdl) are
  *    a 1-row aggregate → broadcast cross join. Only the per-doc tf and
  *    doc-length join shuffles on doc_id.
  *  - Global top-k is orderBy(...).limit(k) → TakeOrderedAndProject:
  *    each task keeps a local k-heap, the driver merges k×tasks rows —
  *    NO single-partition global sort or window (a row_number() over an
  *    unpartitioned window would funnel every scored doc through one
  *    task; ranks are re-derived on the k surviving rows instead).
  *  - Scoring uses literal-for-literal the same arithmetic as the DuckDB
  *    oracle; each TERM's contribution is quantized to integer micro
  *    BEFORE the per-doc sum (the d_lm_score canon, r9) — a double
  *    accumulator's value depends on partial-agg order (varies across
  *    runs, not just engines), while the integer sum is order-free —
  *    and the rank key is the integer score (same guard as
  *    d_tfidf_topterms).
  *
  * BM25 (Robertson/Sparck-Jones, the Lucene-default flavor):
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   s(d, Q) = Σ_{t ∈ Q} idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  * with k1 = 1.2, b = 0.75.
  */
object Retrieval {

  type Q = (SparkSession, String) => DataFrame

  /** The fixed demo query — terms present in the synthetic corpus. */
  val QueryTerms: Seq[String] = Seq("spark", "join", "window")

  /** BM25 top-k doc ids + scores for one keyword query over `docs`
    * (must have `doc_id`, `text`). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(TextOps.toks(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // N counts ALL corpus docs (empty docs too); avgdl is over tokenized
    // docs — both one scan up from `toks`, collapsed to a 1-row broadcast.
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(avg(col("dl")).as("avgdl")))
    val q = toks.filter(col("term").isin(terms: _*))
    val tf = q.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = q.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))

    val scored = tf
      .join(broadcast(dft), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib_u",
        round(col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
          * lit(1e6)).cast("long"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(sum(col("contrib_u")).as("score_micro"),
        count(lit(1)).as("n_terms"))
    val top = perDoc.orderBy(col("score_micro").desc, col("doc_id").asc).limit(k)
    // Rank over the k survivors only (k rows — the window is trivial).
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("score_micro").desc, col("doc_id").asc))
        .cast("long"))
  }

  private val bm25: Q = (spark, dir) =>
    bm25TopK(Tables.load(spark, dir, "documents"), QueryTerms, 10)

  val queries: Map[String, Q] = Map("d_bm25_topk" -> bm25)

  val oracles: Map[String, String] = Map(
    "d_bm25_topk" -> {
      val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, ${TextOps.ToksSql} AS w FROM documents),
         |tok AS (SELECT doc_id, unnest(w) AS term FROM t),
         |tok2 AS (SELECT doc_id, term FROM tok WHERE length(term) > 0),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY 1),
         |stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         |                 (SELECT AVG(dl) FROM dl) AS avgdl),
         |q AS (SELECT doc_id, term FROM tok2 WHERE term IN ($termList)),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM q GROUP BY 1, 2),
         |dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM q GROUP BY 1),
         |scored AS (
         |  SELECT tf.doc_id,
         |    ln(CAST(1.0 AS DOUBLE) +
         |        (stats.n_docs - dft.df + CAST(0.5 AS DOUBLE)) /
         |        (dft.df + CAST(0.5 AS DOUBLE)))
         |      * (tf.tf * CAST(2.2 AS DOUBLE)) /
         |        (tf.tf + CAST(1.2 AS DOUBLE) *
         |          (CAST(0.25 AS DOUBLE) +
         |           CAST(0.75 AS DOUBLE) * dl.dl / stats.avgdl))
         |      * CAST(1e6 AS DOUBLE) AS contrib_x
         |  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id)
         |  CROSS JOIN stats),
         |per AS (SELECT doc_id,
         |               CAST(SUM(CAST(round(contrib_x) AS BIGINT)) AS BIGINT)
         |                 AS score_micro,
         |               COUNT(*) AS n_terms
         |        FROM scored GROUP BY 1),
         |top AS (SELECT doc_id, score_micro, n_terms FROM per
         |        ORDER BY score_micro DESC, doc_id LIMIT 10)
         |SELECT doc_id, score_micro, n_terms,
         |       row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rk
         |FROM top""".stripMargin
    })
}

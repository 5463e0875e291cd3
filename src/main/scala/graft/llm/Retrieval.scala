package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Per-rank DCG discount weights in integer micro-units:
    * round(1e6 / log2(r+1)) for r = 1..10 — generated ONCE here and
    * interpolated as integer LITERALS into both engines (the MinHashA
    * constant-table pattern), so no engine evaluates a transcendental
    * at query time and the metric is exact cross-engine. */
  val DcgWeightsMicro: IndexedSeq[Long] =
    (1 to 10).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** d_retrieval_eval: the IR metric row every retrieval pipeline review
    * reads — nDCG@10, MRR, precision@10, recall@10 for the d_bm25_topk
    * ranking against a DETERMINISTIC graded qrel: grade(d) = number of
    * distinct query terms present in d (0..|Q|). Every metric is pure
    * integer: DCG/IDCG are Σ grade·W(r) over the literal weight table,
    * nDCG/recall are exact pmod-floor ppm ratios, MRR is 1e6 div
    * first-relevant-rank — so the single output row hash-matches DuckDB
    * at any corpus size.
    *
    * Scale shape: the ranking is the d_bm25_topk plan (query-restricted
    * postings, TakeOrdered top-k); the qrel is one distinct+count over
    * the SAME query-term postings; IDCG's ideal ordering needs only the
    * top-10 grades — orderBy().limit(10) (TakeOrdered again), never a
    * global sort; everything after is 1-row broadcast algebra. */
  private val retrievalEval: Q = (spark, dir) => {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val top = bm25TopK(docs, QueryTerms, 10).select($"doc_id", $"rk")
    val grades = docs
      .select($"doc_id", explode(TextOps.toks($"text")).as("term"))
      .filter($"term".isin(QueryTerms: _*))
      .distinct()
      .groupBy($"doc_id").agg(count(lit(1)).as("grade"))
    val w = array(DcgWeightsMicro.map(lit): _*)
    val ranked = top.join(grades, Seq("doc_id"), "left")
      .withColumn("g", coalesce($"grade", lit(0L)))
    val m1 = ranked.agg(
      sum($"g" * element_at(w, $"rk".cast("int"))).as("dcg_micro"),
      sum(when($"g" > 0, 1L).otherwise(0L)).as("n_rel_ret"),
      count(lit(1)).as("n_ret"),
      min(when($"g" > 0, $"rk")).as("first_rel"))
    val idealTop = grades.orderBy($"grade".desc, $"doc_id".asc).limit(10)
      .withColumn("irk", row_number()
        .over(Window.orderBy($"grade".desc, $"doc_id".asc)).cast("long"))
    val m2 = idealTop.agg(
      sum($"grade" * element_at(w, $"irk".cast("int"))).as("idcg_micro"))
    val m3 = grades.agg(count(lit(1)).as("n_rel_total"))
    // the long-space ·10⁶ pre-multiplies below are safe at ANY corpus
    // size: every numerator is @10-bounded (DCG/hit counts over the
    // top-10 ranking), never fact-scaled — the m13 headroom lesson
    // doesn't apply to rank-truncated scalars
    def fdl(num: Column, den: Column): Column =
      graft.util.Cols.floorDiv(num, den).cast("long")
    m1.crossJoin(m2).crossJoin(m3)
      .select($"n_ret", $"n_rel_total", $"n_rel_ret",
        $"dcg_micro", $"idcg_micro",
        fdl($"dcg_micro" * 1000000L, $"idcg_micro").as("ndcg_ppm"),
        coalesce(fdl(lit(1000000L), $"first_rel"), lit(0L))
          .as("mrr_micro"),
        ($"n_rel_ret" * 100000L).as("p_at10_ppm"),
        fdl($"n_rel_ret" * 1000000L, $"n_rel_total").as("recall_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "d_bm25_topk" -> bm25,
    "d_retrieval_eval" -> retrievalEval)

  val oracles: Map[String, String] = Map(
    "d_retrieval_eval" -> {
      val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
      val wList = DcgWeightsMicro.mkString("[", ", ", "]")
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
         |                 AS score_micro
         |        FROM scored GROUP BY 1),
         |top AS (SELECT doc_id, score_micro FROM per
         |        ORDER BY score_micro DESC, doc_id LIMIT 10),
         |ranked AS (SELECT doc_id,
         |             row_number() OVER (ORDER BY score_micro DESC, doc_id)
         |               AS rk
         |           FROM top),
         |grades AS (SELECT doc_id, COUNT(*) AS grade
         |           FROM (SELECT DISTINCT doc_id, term FROM q) GROUP BY 1),
         |gr AS (SELECT r.rk, COALESCE(g.grade, 0) AS g
         |       FROM ranked r LEFT JOIN grades g USING (doc_id)),
         |m1 AS (SELECT CAST(SUM(g * ($wList)[CAST(rk AS INT)]) AS BIGINT)
         |                AS dcg_micro,
         |              CAST(SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |                AS n_rel_ret,
         |              COUNT(*) AS n_ret,
         |              MIN(CASE WHEN g > 0 THEN rk END) AS first_rel
         |       FROM gr),
         |ideal AS (SELECT grade,
         |            row_number() OVER (ORDER BY grade DESC, doc_id) AS irk
         |          FROM grades ORDER BY grade DESC, doc_id LIMIT 10),
         |m2 AS (SELECT CAST(SUM(grade * ($wList)[CAST(irk AS INT)])
         |                AS BIGINT) AS idcg_micro FROM ideal),
         |m3 AS (SELECT COUNT(*) AS n_rel_total FROM grades)
         |SELECT n_ret, n_rel_total, n_rel_ret, dcg_micro, idcg_micro,
         |       CAST((dcg_micro * 1000000) // idcg_micro AS BIGINT)
         |         AS ndcg_ppm,
         |       CAST(COALESCE(1000000 // first_rel, 0) AS BIGINT)
         |         AS mrr_micro,
         |       CAST(n_rel_ret * 100000 AS BIGINT) AS p_at10_ppm,
         |       CAST((n_rel_ret * 1000000) // n_rel_total AS BIGINT)
         |         AS recall_ppm
         |FROM m1, m2, m3""".stripMargin
    },

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

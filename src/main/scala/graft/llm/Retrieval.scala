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

  /** RRF constant (the Cormack/Clarke/Buettcher default) and the
    * query-by-document term cap. */
  val RrfK = 60L
  val QueryTermCap = 8

  /** d_hybrid_rrf: HYBRID retrieval — reciprocal-rank fusion of the
    * sparse (BM25, query-by-document) and dense (embedding-cosine)
    * rankings for the same probe queries, the fusion every production
    * search/RAG stack serves (lexical catches exact keywords dense
    * misses; dense catches paraphrase sparse misses). RRF
    * (Cormack et al., SIGIR 2009): score(d) = Σ_lists 1/(k + rank_d),
    * k = 60 — rank-only, so the two engines' incomparable score scales
    * (integer micro-BM25 vs cosine) never mix; each term is the exact
    * integer floor 10⁹/(60+rank) and the fused ordering is
    * hash-checked end-to-end.
    *
    * The sparse side generalizes [[bm25TopK]] to per-query rankings
    * with QUERY-BY-DOCUMENT semantics (the probe doc's own text is the
    * query — related-doc search): each query is compressed to its
    * [[QueryTermCap]] RAREST terms by global df (rarest-term
    * compression — the standard guard that keeps posting fan-in
    * bounded: common-term postings are corpus-sized at 100 TB, rare
    * terms' are not, and rare terms carry the ranking signal anyway).
    * Scale shape: postings restricted to the ≤ nq·cap query terms
    * right after the token explode; df/stats are broadcast-sized; the
    * per-query candidate set is Σ df over 8 rare terms — bounded;
    * per-query top-20 windows run over those bounded partitions. The
    * dense side is the declared brute baseline ([[Similarity
    * .topkBrute]] — the oracled exact ranking; at serving scale the
    * IVF tier is a drop-in column substitution). Absent ranks
    * contribute 0 exactly (a list that never saw the doc), surfaced as
    * r_sparse/r_dense = 0 in the audit columns. */
  private val hybridRrf: Q = (spark, dir) =>
    hybridRrfPlan(spark, dir, served = false)

  /** The SERVED twin (VERDICT r12 #3): identical sparse side and
    * fusion, dense side ranked by the persisted IVF tier instead of
    * the brute scan — candidate generation is posting-row work against
    * the parquet index artifacts, so the dense cost drops from
    * corpus-scan to serve-scale (the 13.7 s sf10 brute term was the
    * dominant cost of the fused query). Oracle-checked end-to-end
    * against the same pinned index parquet; RetrievalSpec floors its
    * fused-set overlap vs the brute-fused twin. */
  private val hybridRrfServed: Q = (spark, dir) =>
    hybridRrfPlan(spark, dir, served = true)

  private def hybridRrfPlan(spark: SparkSession, dir: String,
                            served: Boolean): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    // ONE tokenization pass → the (doc, term, tf) postings table, the
    // classic inverted-index build: every downstream aggregate (doc
    // lengths, query vocab, df, candidate tf) derives from this compact
    // relation instead of re-exploding the fact-scale token stream per
    // consumer (the naive 4-explode spelling measured 4.2 s vs 2.6 s at
    // sf0.1). Pinned once — it is 2-5× smaller than the raw token
    // stream and consumed four times.
    val tcounts = docs
      .select(col("doc_id"), explode(TextOps.toks(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val dl = tcounts.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(avg($"dl").as("avgdl")))
    val nq = Similarity.NumQueryVecs
    val qt = tcounts.filter($"doc_id" < nq)
      .select($"doc_id".as("query_id"), $"term") // (doc, term) is unique
    val dft = tcounts.join(broadcast(qt.select($"term").distinct()), "term")
      .groupBy($"term").agg(count(lit(1)).as("df")) // rows ARE distinct docs
    val wq = Window.partitionBy($"query_id").orderBy($"df".asc, $"term".asc)
    val q8 = qt.join(broadcast(dft), "term")
      .withColumn("qr", row_number().over(wq))
      .filter($"qr" <= QueryTermCap)
      .select($"query_id", $"term", $"df")
    val tf = tcounts.join(broadcast(q8), "term")
      .filter($"doc_id" =!= $"query_id")
      .select($"query_id", $"doc_id", $"term", $"df", $"tf")
    val contrib = tf.join(dl, "doc_id").crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))))
      .withColumn("contrib_u", round($"idf" * ($"tf" * lit(2.2)) /
        ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl"))
        * lit(1e6)).cast("long"))
    val ws = Window.partitionBy($"query_id")
      .orderBy($"s_micro".desc, $"doc_id".asc)
    val sparse = contrib.groupBy($"query_id", $"doc_id")
      .agg(sum($"contrib_u").as("s_micro"))
      .withColumn("r_sparse", row_number().over(ws).cast("long"))
      .filter($"r_sparse" <= 20)
      .select($"query_id", $"doc_id", $"r_sparse")
    val dense = (if (served)
                   Similarity.topkIvf(spark, dir, 20,
                     nprobe = Similarity.ServedNprobe)
                 else Similarity.topkBrute(spark, dir, 20))
      .select($"query_id", $"neighbor_id".as("doc_id"),
        $"rank".as("r_dense"))
    def rrfTerm(r: Column): Column =
      when(r.isNotNull, graft.util.Cols
        .floorDiv(lit(1000000000L), lit(RrfK) + r).cast("long"))
        .otherwise(0L)
    val wf = Window.partitionBy($"query_id")
      .orderBy($"rrf_micro".desc, $"doc_id".asc)
    sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select($"query_id", $"doc_id",
        (rrfTerm($"r_sparse") + rrfTerm($"r_dense")).as("rrf_micro"),
        coalesce($"r_sparse", lit(0L)).as("r_sparse"),
        coalesce($"r_dense", lit(0L)).as("r_dense"))
      .withColumn("rank", row_number().over(wf).cast("long"))
      .filter($"rank" <= 10)
  }

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
    "d_hybrid_rrf" -> hybridRrf,
    "d_hybrid_rrf_served" -> hybridRrfServed,
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
    },

    // Mirrors hybridRrf stage for stage: same tokenization, rarest-term
    // query compression, BM25 integer-micro contribs (the d_bm25_topk
    // spelling), brute cosine ranks (the sim_topk_brute spelling), and
    // the exact 10⁹/(60+rank) RRF floors. Staging CTEs MATERIALIZED
    // (the j9/ADC rule).
    "d_hybrid_rrf" -> {
      val dotSql =
        """list_reduce(list_prepend(0.0::DOUBLE,
          |    list_transform(list_zip(q.qv, e.v), p -> p[1] * p[2])),
          |    (acc, x) -> acc + x)""".stripMargin
      hybridSql(
        s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |qv AS (SELECT vec_id AS query_id, v AS qv FROM e
           |       WHERE vec_id < ${Similarity.NumQueryVecs}),
           |den0 AS (SELECT q.query_id, e.vec_id AS doc_id, $dotSql AS cosine
           |         FROM qv q, e WHERE e.vec_id <> q.query_id),
           |de AS MATERIALIZED (SELECT query_id, doc_id, r_dense FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY cosine DESC, doc_id) AS r_dense FROM den0)
           |  WHERE r_dense <= 20)""".stripMargin)
    },

    // The served twin: dense ranks come from the IVF candidate scoring
    // fragment (the sim_topk_ivf routing over the persisted parquet
    // index), everything else shared with d_hybrid_rrf via hybridSql.
    "d_hybrid_rrf_served" -> hybridSql(
      s"""${Similarity.ivfScoredCteSql()},
         |de AS MATERIALIZED (SELECT query_id, doc_id, r_dense FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, doc_id) AS r_dense FROM i_sc)
         |  WHERE r_dense <= 20)""".stripMargin))

  /** The hybrid-RRF oracle chain parameterized by the DENSE block
    * (which must end with a `de(query_id, doc_id, r_dense)` CTE, ranks
    * 1..20): the sparse BM25 chain, the full-outer fusion, and the
    * integer RRF floors are generated once for both the brute-dense
    * and served-IVF-dense variants so they can never drift. */
  private def hybridSql(denseCtes: String): String = {
    s"""WITH t AS (SELECT doc_id, ${TextOps.ToksSql} AS w FROM documents),
         |tok AS (SELECT doc_id, unnest(w) AS term FROM t),
         |tok2 AS MATERIALIZED (SELECT doc_id, term FROM tok WHERE length(term) > 0),
         |dl AS MATERIALIZED (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY 1),
         |stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         |                 (SELECT AVG(dl) FROM dl) AS avgdl),
         |qt AS MATERIALIZED (
         |  SELECT DISTINCT doc_id AS query_id, term FROM tok2
         |  WHERE doc_id < ${Similarity.NumQueryVecs}),
         |dft AS MATERIALIZED (
         |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok2
         |  WHERE term IN (SELECT term FROM qt) GROUP BY 1),
         |q8 AS MATERIALIZED (SELECT query_id, term, df FROM (
         |    SELECT qt.query_id, qt.term, dft.df,
         |      row_number() OVER (PARTITION BY qt.query_id
         |        ORDER BY dft.df, qt.term) AS qr
         |    FROM qt JOIN dft USING (term))
         |  WHERE qr <= $QueryTermCap),
         |tf AS MATERIALIZED (
         |  SELECT q8.query_id, tok2.doc_id, tok2.term, q8.df, COUNT(*) AS tf
         |  FROM tok2 JOIN q8 USING (term)
         |  WHERE tok2.doc_id <> q8.query_id
         |  GROUP BY 1, 2, 3, 4),
         |sc AS (
         |  SELECT tf.query_id, tf.doc_id,
         |    ln(CAST(1.0 AS DOUBLE) +
         |        (stats.n_docs - tf.df + CAST(0.5 AS DOUBLE)) /
         |        (tf.df + CAST(0.5 AS DOUBLE)))
         |      * (tf.tf * CAST(2.2 AS DOUBLE)) /
         |        (tf.tf + CAST(1.2 AS DOUBLE) *
         |          (CAST(0.25 AS DOUBLE) +
         |           CAST(0.75 AS DOUBLE) * dl.dl / stats.avgdl))
         |      * CAST(1e6 AS DOUBLE) AS contrib_x
         |  FROM tf JOIN dl USING (doc_id) CROSS JOIN stats),
         |per AS (SELECT query_id, doc_id,
         |          CAST(SUM(CAST(round(contrib_x) AS BIGINT)) AS BIGINT)
         |            AS s_micro
         |        FROM sc GROUP BY 1, 2),
         |sp AS MATERIALIZED (SELECT query_id, doc_id, r_sparse FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY s_micro DESC, doc_id) AS r_sparse FROM per)
         |  WHERE r_sparse <= 20),
         |$denseCtes,
         |fu AS (SELECT COALESCE(sp.query_id, de.query_id) AS query_id,
         |              COALESCE(sp.doc_id, de.doc_id) AS doc_id,
         |              sp.r_sparse, de.r_dense
         |       FROM sp FULL OUTER JOIN de
         |         ON sp.query_id = de.query_id AND sp.doc_id = de.doc_id),
         |sc2 AS (SELECT query_id, doc_id,
         |          CAST(COALESCE(1000000000 // ($RrfK + r_sparse), 0)
         |             + COALESCE(1000000000 // ($RrfK + r_dense), 0)
         |            AS BIGINT) AS rrf_micro,
         |          CAST(COALESCE(r_sparse, 0) AS BIGINT) AS r_sparse,
         |          CAST(COALESCE(r_dense, 0) AS BIGINT) AS r_dense
         |        FROM fu)
         |SELECT query_id, doc_id, rrf_micro, r_sparse, r_dense,
         |       CAST(rn AS BIGINT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_micro DESC, doc_id) AS rn FROM sc2)
         |WHERE rn <= 10""".stripMargin
  }
}

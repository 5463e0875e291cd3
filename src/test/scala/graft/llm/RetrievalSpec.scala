package graft.llm

import java.nio.file.Files

import graft.SparkSpec

/** Metric-layer law for d_retrieval_eval: the engine's single metric row
  * must equal an independent plain-Scala recomputation over the (already
  * oracle-proven) bm25TopK ranking — and the planted corpus is shaped so
  * the metrics are NON-trivial (a high-tf grade-1 spam doc outranks the
  * only grade-3 doc, so nDCG < 1). */
class RetrievalSpec extends SparkSpec {

  test("retrieval eval equals independent metric arithmetic; spam doc dents nDCG") {
    import spark.implicits._
    // df(spark) = 2 → high idf: the 8×-tf spam doc outscores the
    // grade-3 doc; grade-2 docs carry only the common join/window terms.
    val texts = Seq(
      1L -> "spark spark spark spark spark spark spark spark", // grade 1
      2L -> "spark join window filler") ++                     // grade 3
      (3L to 13L).map(i => i -> s"join window common filler$i") ++ // grade 2
      Seq(14L -> "nothing relevant here at all")               // grade 0
    val docs = texts.map { case (id, t) =>
      (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = Files.createTempDirectory("retrieval-spec").toString
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")

    // independent grade + metric computation over the trusted ranking
    val grade = texts.map { case (id, t) =>
      id -> Retrieval.QueryTerms.count(t.split("\\s+").contains) }.toMap
    val ranks = Retrieval.bm25TopK(
      spark.read.parquet(s"$d/documents.parquet"),
      Retrieval.QueryTerms, 10)
      .select($"doc_id", $"rk").as[(Long, Long)].collect()
      .sortBy(_._2).map(_._1)
    val w = Retrieval.DcgWeightsMicro
    val dcg = ranks.zipWithIndex.map { case (id, i) =>
      grade(id).toLong * w(i) }.sum
    val idealGrades = grade.values.filter(_ > 0).toSeq.sorted.reverse.take(10)
    val idcg = idealGrades.zipWithIndex.map { case (g, i) => g * w(i) }.sum
    val nRelTotal = grade.values.count(_ > 0).toLong
    val nRelRet = ranks.count(grade(_) > 0).toLong
    val firstRel = ranks.indexWhere(grade(_) > 0) + 1

    val out = Retrieval.queries("d_retrieval_eval")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    val (nRet, relTot, relRet, dcgM, idcgM, ndcg, mrr, p10, rec) = (
      out._1, out._2, out._3, out._4, out._5, out._6, out._7, out._8, out._9)
    assert(nRet == 10L && relTot == nRelTotal && relRet == nRelRet)
    assert(dcgM == dcg && idcgM == idcg)
    assert(ndcg == dcg * 1000000L / idcg)
    assert(mrr == 1000000L / firstRel)
    assert(p10 == nRelRet * 100000L)
    assert(rec == nRelRet * 1000000L / nRelTotal)
    // the plant worked: spam at rank 1 dents nDCG strictly below 1.0
    assert(grade(ranks.head) == 1 && ndcg < 1000000L,
      s"expected a dented nDCG, got $ndcg with ranking ${ranks.toSeq}")
  }
}

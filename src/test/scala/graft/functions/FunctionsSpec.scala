package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.TextOps

class FunctionsSpec extends SparkSpec {

  test("MinHashAgg Aggregator equals the relational minhash signature spelling") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark makes big data simple and fast for everyone today", "en", "s", 10L),
      (1L, "completely different words about cooking pasta with olive oil", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = Files.createTempDirectory("fn-spec").toString
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")

    val relational = TextOps.minhashSigTable(spark.read.parquet(s"$d/documents.parquet"))
      .collect().map(r => r.getLong(0) -> (1 to TextOps.MinHashK).map(r.getLong)).toMap

    val typed = docs
      .select($"doc_id", explode(TextOps.shingles(TextOps.toks($"text"))).as("s"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAgg.toColumn.name("sig"))
      .collect().toMap

    assert(typed.keySet == relational.keySet)
    typed.foreach { case (id, sig) =>
      assert(sig.toSeq == relational(id).toSeq, s"doc $id")
    }
  }
}

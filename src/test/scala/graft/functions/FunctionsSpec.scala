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

  test("graft_dot is bit-identical to the HOF fold spelling, incl. null cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Seq[Option[Double]], Seq[Option[Double]])] =
      (0 until 50).map { _ =>
        (Seq.fill(64)(Some(rnd.nextDouble() - 0.5)),
         Seq.fill(64)(Some(rnd.nextDouble() - 0.5)))
      } ++ Seq(
        // a null ELEMENT must null the whole product (zip_with parity)
        (Seq(Some(1.0), None, Some(2.0)), Seq(Some(3.0), Some(4.0), Some(5.0))))
    val df = rows.toDF("a", "b")
      .withColumn("hof",
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("native", call_function("graft_dot", $"a", $"b"))
    // bit-exact, not just approximately equal (doubleToLongBits compare)
    val vals = df.select($"hof", $"native").collect()
    assert(vals.length == rows.length)
    vals.foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (true, true) => // both null (the null-element row)
        case (false, false) =>
          assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
                 java.lang.Double.doubleToLongBits(r.getDouble(1)),
            s"bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
        case other => fail(s"null mismatch: $r")
      }
    }
  }
}

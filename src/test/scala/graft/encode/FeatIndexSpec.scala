package graft.encode

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S4/S5/K6 regression against the reference's own 19-row sample
  * fixtures (LR/data/churn_train_sample.{csv,svm} + the 186-entry
  * churn_featindex.txt). The fixtures are read from the read-only
  * reference checkout at test time; suites skip (assume) if absent. */
class FeatIndexSpec extends SparkSpec {

  private val RefData = "/root/reference/LR/data"
  private def refAvailable = Files.exists(Paths.get(s"$RefData/churn_featindex.txt"))

  test("reference featindex dictionary parses to 186 entries with per-field other slots") {
    assume(refAvailable)
    val dict = FeatIndex.loadDictFile(s"$RefData/churn_featindex.txt")
    assert(dict.size == 186)
    assert(dict("0:other") == 0)
    // every field has an `other` slot
    val fields = dict.keys.map(_.split(":")(0).toInt).toSet
    assert(fields == (0 until 36).toSet)
    fields.foreach(f => assert(dict.contains(s"$f:other")))
  }

  test("encoding the reference sample CSV reproduces its sample SVM byte-for-byte") {
    assume(refAvailable)
    import spark.implicits._
    val dict = FeatIndex.loadDictFile(s"$RefData/churn_featindex.txt")
    // libsvm_transform.py:14-23 — drop first col (USR_NUM_ID) and last
    // (label) from each CSV row; our encode does the same via field list.
    val csv = spark.read.option("header", "true").csv(s"$RefData/churn_train_sample.csv")
    val fields = csv.columns.drop(1).dropRight(1).toSeq // 36 feature cols
    val encoded = FeatIndex.encode(csv, fields, "label", dict)
    val lines = FeatIndex.toLibsvmLines(encoded).as[String].collect()

    // NOTE: the reference's sample files are cut at different lengths —
    // the CSV has 19 data rows which match SVM lines 1-19 exactly; the
    // SVM carries an orphan 20th line with no CSV counterpart (verified
    // by replaying libsvm_transform.py over the CSV). Compare aligned.
    val expected = scala.io.Source.fromFile(s"$RefData/churn_train_sample.svm", "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toSeq
    assert(lines.length == 19 && expected.length == 20)
    lines.zip(expected.take(19)).foreach { case (got, want) => assert(got == want) }
  }

  test("dense scatter (S5) puts exactly the encoded ones in a 186-dim vector") {
    assume(refAvailable)
    import spark.implicits._
    val dict = FeatIndex.loadDictFile(s"$RefData/churn_featindex.txt")
    val csv = spark.read.option("header", "true").csv(s"$RefData/churn_train_sample.csv")
    val fields = csv.columns.drop(1).dropRight(1).toSeq
    val encoded = FeatIndex.encode(csv, fields, "label", dict)
    val dense = FeatIndex.toDenseVector(encoded, 186)
    val row = dense.select($"indices", $"features").head()
    val idx = row.getSeq[Long](0).toSet
    val vec = row.getAs[org.apache.spark.ml.linalg.Vector](1)
    assert(vec.size == 186)
    (0 until 186).foreach { d =>
      assert(vec(d) == (if (idx.contains(d.toLong)) 1.0 else 0.0))
    }
  }

  test("unseen value falls back to the field's other slot") {
    import spark.implicits._
    val dict = Map("0:other" -> 0, "0:x" -> 1, "1:other" -> 2, "1:y" -> 3)
    val df = Seq(("zzz", "y", 1), ("x", "zzz", 0)).toDF("f0", "f1", "label")
    val out = FeatIndex.encode(df, Seq("f0", "f1"), "label", dict)
      .select($"indices").as[Seq[Long]].collect()
    assert(out.toSet == Set(Seq(0L, 3L), Seq(1L, 2L)))
  }

  test("one-based write round-trips through Spark's libsvm source") {
    import spark.implicits._
    val dict = Map("0:other" -> 0, "0:a" -> 1, "0:b" -> 2, "1:other" -> 3, "1:c" -> 4)
    val df = Seq(("a", "c", 1), ("b", "q", 0)).toDF("f0", "f1", "label")
    val encoded = FeatIndex.encode(df, Seq("f0", "f1"), "label", dict)
    val tmp = Files.createTempDirectory("libsvm-rt").toString
    FeatIndex.writeLibsvmText(FeatIndex.toLibsvmLines(encoded, oneBased = true), s"$tmp/d.svm")
    val back = FeatIndex.readLibsvm(spark, s"$tmp/d.svm", dict.size)
      .select($"label", $"features").collect()
    val got = back.map { r =>
      (r.getDouble(0),
       r.getAs[org.apache.spark.ml.linalg.Vector](1).toSparse.indices.toSeq)
    }.toSet
    assert(got == Set((1.0, Seq(1, 4)), (0.0, Seq(2, 3))))
  }
}

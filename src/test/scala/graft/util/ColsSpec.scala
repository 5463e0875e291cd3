package graft.util

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.util.Cols._

/** Property tests for the exact round/bround ratio helpers — they must
  * equal BigDecimal HALF_UP / HALF_EVEN at scale 2 for every (num100,
  * den) in the IEEE-exact range. (Raw ScalaCheck Gen; the
  * scalatestplus bridge isn't on the offline classpath.) */
class ColsSpec extends SparkSpec {

  private def expected(num100: Long, den: Long, mode: RoundingMode): Double =
    new JBigDecimal(num100)
      .divide(new JBigDecimal(den * 100), 2, mode)
      .doubleValue()

  test("roundRatio2 == BigDecimal HALF_UP and broundRatio2 == HALF_EVEN (property)") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(0L, 4000000000L) // < 2^52/100 keeps steps exact
      d <- Gen.chooseNum(1L, 100000L)
    } yield (n, d)
    val cases = Gen.listOfN(300, gen).sample.get :+
      ((125L, 1L)) :+ ((135L, 1L)) :+ ((5L, 10L)) :+ ((15L, 10L)) // exact ties
    val df = cases.toDF("n", "d")
      .select($"n", $"d",
        roundRatio2($"n", $"d").as("r"),
        broundRatio2($"n", $"d").as("br"))
    df.collect().foreach { row =>
      val (n, d) = (row.getLong(0), row.getLong(1))
      assert(row.getDouble(2) == expected(n, d, RoundingMode.HALF_UP),
        s"roundRatio2($n,$d)")
      assert(row.getDouble(3) == expected(n, d, RoundingMode.HALF_EVEN),
        s"broundRatio2($n,$d)")
    }
  }

  test("dsum is exact for 2-decimal money (no double accumulation drift)") {
    import spark.implicits._
    // 0.1+0.2 style cases that drift in double space
    val vals = Seq.fill(1000)(0.01) ++ Seq.fill(1000)(0.10) ++ Seq(0.2, 0.3)
    val got = vals.toDF("x").agg(dsum($"x")).head().getDouble(0)
    assert(got == 110.5)
  }
}

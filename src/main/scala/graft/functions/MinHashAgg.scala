package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import graft.llm.TextOps

/** Typed custom aggregate (SURVEY §7.8 stretch): fold shingle strings
  * directly into a k-slot MinHash signature.
  *
  * `Aggregator[IN, BUF, OUT]` is the typed face of
  * TypedImperativeAggregate — Spark plans it as an ObjectHashAggregate
  * with partial merge, so the signature still reduces map-side before the
  * shuffle. Values are IDENTICAL to the relational spelling in
  * [[graft.llm.TextOps.minhashSigTable]] (one md5 base hash + the
  * MinHashA multiplicative permutations), which stays the hot path:
  * native min() aggs get whole-stage codegen, an Aggregator does not.
  * This class exists to cover the custom-aggregate surface — the escape
  * hatch for sketches that CAN'T be phrased as native aggs (verified
  * equal in FunctionsSpec).
  */
object MinHashAgg extends Aggregator[String, Array[Long], Array[Long]] {

  private val K = TextOps.MinHashK
  private val Empty = (1L << 48)

  override def zero: Array[Long] = Array.fill(K)(Empty)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    // ONE digest (the shared TextOps definition — oracle parity depends
    // on exactly one hash48 implementation); slots are mult. perms
    val h = TextOps.hash48Jvm(shingle)
    var j = 0
    while (j < K) {
      val p = (h * TextOps.MinHashA(j)) & (TextOps.M48 - 1)
      if (p < buf(j)) buf(j) = p
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < K) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 48-bit md5 hash — the hot scalar of every sketch
  * operator (MinHash computes it k+0 times per shingle, SimHash once per
  * token, LSH once per (plane, dim)).
  *
  * Value contract: identical to the composed spelling
  * `conv(substring(md5(s), 1, 12), 16, 10)` (first 6 md5 bytes,
  * big-endian) and to DuckDB's `CAST('0x' || substr(md5(s),1,12) AS
  * BIGINT)` — so swapping it in changes no oracle. What it removes per
  * call: the hex-string materialization, the substring copy, and conv's
  * base-conversion parse — three allocations for a value we can read
  * straight out of the digest. doGenCode emits a direct static call, so
  * the expression stays inside whole-stage codegen.
  */
case class Hash48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_hash48 requires a string argument, got ${child.dataType}")
  override def prettyName: String = "graft_hash48"

  override protected def nullSafeEval(input: Any): Any =
    Hash48.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash48.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash48 =
    copy(child = newChild)
}

object Hash48 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 6 md5 bytes, big-endian → [0, 2^48). Called from generated
    * code — must stay a cheap static-shaped method. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Register as SQL function `graft_hash48` (used via call_function). */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("graft_hash48"),
      new ExpressionInfo(classOf[Hash48].getName, "graft_hash48"),
      (children: Seq[Expression]) => Hash48(children.head)))
}

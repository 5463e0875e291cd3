package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns — the
  * inner loop of every similarity/embedding-dedup operator (brute top-k,
  * LSH candidate verify, IVF ranking, probe near-dup all score one
  * cosine per candidate pair).
  *
  * Value contract: identical to the HOF spelling
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x)`
  * — same left-to-right summation order (bit-exact doubles, so no oracle
  * changes) and same null semantics (NULL input or any NULL element →
  * NULL result; unequal lengths sum over the shorter prefix, matching
  * zip_with's null padding folding to NULL — callers use fixed-64
  * embeddings, so that branch never fires in practice). What it removes
  * per pair: two interpreted HOF evaluations (higher-order lambdas are
  * CodegenFallback — no whole-stage codegen, per-element closure calls)
  * and the intermediate product array allocation.
  */
case class DotF64(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<double> arguments, got $l, $r")
  }

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotF64.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.DotF64.dotOrNull($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

object DotF64 {

  /** Left-to-right product sum; null on any null element (parity with
    * the zip_with/aggregate spelling). Called from generated code. */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Register as SQL function `graft_dot` (used via call_function). */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotF64].getName, "graft_dot"),
      (children: Seq[Expression]) => DotF64(children.head, children(1))))
}

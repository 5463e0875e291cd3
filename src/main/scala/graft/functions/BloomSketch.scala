package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-callable wrappers over Spark's own bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the exact pair
  * Catalyst's `InjectRuntimeFilter` uses for runtime bloom-join
  * pruning, but which `org.apache.spark.sql.functions` does not expose).
  *
  * `graft_bloom_agg(col[, estimatedNumItems[, numBits]])` folds a column
  * of longs into ONE binary bloom sketch — partial sketches are built per
  * partition and merged, so the aggregate moves kilobytes, not rows.
  * `graft_might_contain(filterBinary, col)` probes it; the filter side
  * must be foldable (a literal / scalar-subquery result), which is also
  * how Spark's own runtime filter materializes the sketch.
  *
  * Used by [[graft.llm.Dedup.contaminationBloom]] — the decontamination
  * spelling for when the eval set outgrows a broadcast hash join but its
  * bloom still fits comfortably.
  */
object BloomSketch {

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c)       => new BloomFilterAggregate(c)
        case Seq(c, n)    => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case other => throw new IllegalArgumentException(
          s"graft_bloom_agg expects 1-3 arguments, got ${other.size}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => children match {
        case Seq(bf, v) => BloomFilterMightContain(bf, v)
        case other => throw new IllegalArgumentException(
          s"graft_might_contain expects 2 arguments, got ${other.size}")
      }))
  }
}

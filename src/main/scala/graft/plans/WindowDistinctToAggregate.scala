package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.expressions.{RowFrame, SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the reference's window+distinct idiom
  * (RF/randomforest_churn.scala:62-72: `max(x).over(partitionBy(k))` ×N →
  * `select(k, aggs).distinct()`).
  *
  * Semantically that pipeline IS `groupBy(k).agg(...)`, but Catalyst has
  * no rewrite for it (SURVEY §4): the window spelling pays a full sort
  * after the exchange, materializes the aggregate onto EVERY input row,
  * and only then collapses with a second (distinct) aggregate — and it
  * gets no map-side partial aggregation. This rule rewrites the whole
  * stack into one hash Aggregate: partial agg before the exchange, no
  * sort, no row materialization.
  *
  * By optimizer time the withColumn-chain shape is
  *
  *   Aggregate_distinct(Project(outs, Wn(Pn-1(... W1(P0(child)))))
  *
  * with window inputs pre-projected into `_w#` aliases and outputs
  * post-processed (casts) in the Projects. The rule folds the chain
  * bottom-up, inlining project aliases into the window aggregates, and
  * fires only when EVERY window function in the chain is a deterministic,
  * non-distinct AggregateExpression over the entire partition (no
  * orderBy, unbounded row frame), every node shares one partition spec,
  * all partition keys survive to the output, and every output is an
  * expression over partition keys + window results only — i.e. exactly
  * the idiom's contract (distinct collapses each partition to one row).
  */
object WindowDistinctToAggregate extends Rule[LogicalPlan] {

  private def isFullPartition(spec: WindowSpecDefinition): Boolean =
    spec.orderSpec.isEmpty && (spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing) => true
      case _ => false
    })

  /** Fold a Project/Window chain bottom-up.
    * Returns (child, partitionSpec, inline map attrId → expression over
    * child output, agg set: attrIds whose expression contains an
    * AggregateExpression). None → shape not eligible. */
  private def fold(plan: LogicalPlan)
      : Option[(LogicalPlan, Seq[Expression], Map[Long, Expression], Set[Long])] =
    plan match {
      case Project(projList, inner) =>
        fold(inner) match {
          case Some((child, ps, env, aggIds)) =>
            if (!projList.forall(_.deterministic)) None
            else {
              var newEnv = env
              var ok = true
              projList.foreach {
                case a @ Alias(e, _) =>
                  val inlined = substitute(e, env)
                  // expressions over agg results are fine; expressions
                  // mixing agg results with raw child attrs are not
                  if (mixesAggAndRaw(inlined, aggIds, e, env)) ok = false
                  newEnv += (a.exprId.id -> inlined)
                case ar: AttributeReference => () // passthrough: env already covers or raw child attr
                case _ => ok = false
              }
              if (ok) Some((child, ps, newEnv, aggIds)) else None
            }
          case None =>
            // innermost: the plan below the deepest Window
            Some((plan, Nil, Map.empty, Set.empty))
        }

      case Window(windowExprs, ps, Nil, inner, _) if ps.nonEmpty =>
        // a non-Project/Window child ends the chain (e.g. a bare scan)
        fold(inner).orElse(Some((inner, Seq.empty[Expression],
            Map.empty[Long, Expression], Set.empty[Long])))
          .flatMap { case (child, innerPs, env, aggIds) =>
          val psResolved = ps.map(substitute(_, env))
          if (innerPs.nonEmpty &&
              !(innerPs.length == psResolved.length &&
                innerPs.zip(psResolved).forall { case (a, b) => a.semanticEquals(b) }))
            None
          else {
            var newEnv = env
            var newAggIds = aggIds
            var ok = true
            windowExprs.foreach {
              case a @ Alias(WindowExpression(ae: AggregateExpression, spec), _)
                  if isFullPartition(spec) && ae.deterministic && !ae.isDistinct =>
                newEnv += (a.exprId.id -> substitute(ae, env))
                newAggIds += a.exprId.id
              case _ => ok = false
            }
            if (ok) Some((child, psResolved, newEnv, newAggIds)) else None
          }
        }

      case _ => None
    }

  /** Replace attribute references that have definitions in env. */
  private def substitute(e: Expression, env: Map[Long, Expression]): Expression =
    e.transformUp {
      case ar: AttributeReference if env.contains(ar.exprId.id) => env(ar.exprId.id)
    }

  /** An inlined expression must not combine an aggregate result with a
    * raw per-row attribute (e.g. agg_result + raw_col): post-distinct
    * such a column would not be partition-constant. Conservative check:
    * if the ORIGINAL expr referenced any agg-bearing attr, all its other
    * attr refs must also be agg-bearing or resolve through env. */
  private def mixesAggAndRaw(inlined: Expression, aggIds: Set[Long],
                             orig: Expression, env: Map[Long, Expression]): Boolean = {
    val refs = orig.references.toSeq.map(_.exprId.id)
    val hasAgg = refs.exists(aggIds.contains)
    val hasRaw = refs.exists(id => !aggIds.contains(id) && !env.contains(id))
    hasAgg && hasRaw
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupingExprs, resultExprs, proj @ Project(_, _: Window), _)
        // a pure distinct: result = plain attrs, grouping = same attr SET
        // (Spark does not keep the two lists in the same order)
        if resultExprs.forall(_.isInstanceOf[AttributeReference]) &&
          groupingExprs.forall(_.isInstanceOf[AttributeReference]) &&
          groupingExprs.map { case ar: AttributeReference => ar.exprId.id }.toSet ==
            resultExprs.map { case ar: AttributeReference => ar.exprId.id }.toSet =>
      rewrite(agg, proj).getOrElse(agg)
  }

  private def rewrite(distinctAgg: Aggregate, proj: Project): Option[LogicalPlan] = {
    val Project(projList, wplan) = proj
    fold(wplan).flatMap { case (child, ps, env, aggIds) =>
      if (ps.isEmpty || !ps.forall(_.isInstanceOf[AttributeReference])) return None
      val psIds = ps.collect { case ar: AttributeReference => ar.exprId.id }.toSet

      // Build the final result expressions over child output.
      val outs: Seq[Option[NamedExpression]] = projList.map {
        case ar: AttributeReference if psIds.contains(ar.exprId.id) =>
          Some(ar)
        case ar: AttributeReference if env.contains(ar.exprId.id) &&
            aggIds.contains(ar.exprId.id) =>
          Some(Alias(env(ar.exprId.id), ar.name)(exprId = ar.exprId))
        case a @ Alias(e, name) if !mixesAggAndRaw(e, aggIds, e, env) &&
            e.references.forall(r =>
              aggIds.contains(r.exprId.id) || psIds.contains(r.exprId.id) ||
                env.contains(r.exprId.id)) =>
          val inlined = substitute(e, env)
          if (containsAgg(inlined)) Some(Alias(inlined, name)(exprId = a.exprId))
          else None // scalar over raw attrs — not partition-constant in general
        case _ => None
      }
      val psOut = projList.collect {
        case ar: AttributeReference if psIds.contains(ar.exprId.id) => ar.exprId.id
      }.toSet
      if (outs.forall(_.isDefined) && psIds.subsetOf(psOut))
        Some(Aggregate(ps, outs.flatten, child))
      else None
    }
  }

  private def containsAgg(e: Expression): Boolean =
    e.exists(_.isInstanceOf[AggregateExpression])
}

/** `spark.sql.extensions` entry point. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => WindowDistinctToAggregate)
    graft.functions.Hash48.register(ext)
    graft.functions.DotF64.register(ext)
    graft.functions.BloomSketch.register(ext)
  }
}

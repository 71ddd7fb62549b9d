package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: the ubiquitous "top-k per key" SQL idiom
  *
  *   SELECT cols FROM (SELECT *, row_number() OVER
  *     (PARTITION BY k ORDER BY o) AS rn FROM t) WHERE rn <= K
  *
  * becomes the whole-operator [[TopKPerKeyPlan]] when the rank column is
  * dropped by the enclosing projection. Spark's own planner already
  * improves this shape with WindowGroupLimit (map-side row pruning,
  * Spark 3.5+, `InferWindowGroupLimit`), but that still plans the full
  * Window: survivors are exchange-shuffled, SORTED per partition, the
  * rank evaluated, then filtered. The bounded-heap operator removes the
  * sort and the rank entirely — partial heaps cap each map partition at
  * k rows per key, the exchange carries only survivors, final heaps
  * finish. Same results whenever the window order is total; with ties,
  * both formulations pick an arbitrary k (row_number over a non-total
  * order is itself tie-arbitrary).
  *
  * Matched filters: `rn <= K`, `rn < K`, `K >= rn`, `K > rn`, `rn = 1`.
  * Guards: single window expression, plain-attribute partition keys,
  * K must be positive after normalization. When the enclosing projection
  * references the rank, the plan node is asked to EMIT it (the final
  * bounded heap pops its k survivors already ordered, so the 1..k
  * numbering is free) — the rewrite fires either way. Disable with
  * `spark.graft.topk.rewrite=false`.
  */
class RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.topk.rewrite", "true").toBoolean

  /** The filter bound as "keep rows with row_number <= k", if `cond` is
    * one of the supported comparison shapes against `rn`.
    */
  private def rankBound(cond: Expression, rn: Attribute): Option[Long] = {
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rn) =>
        lit(l).filter(_ == 1L)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rn) =>
        lit(l).filter(_ == 1L)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case p @ Project(projectList,
          Filter(cond,
            Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
              partitionSpec, orderSpec, child, _)))
          if partitionSpec.nonEmpty &&
            partitionSpec.forall(_.isInstanceOf[AttributeReference]) &&
            orderSpec.nonEmpty &&
            // the order key may be any expression over the child's output
            // (the heap evaluates it per comparison); partition keys stay
            // plain attributes because they type the logical node
            orderSpec.forall(_.references.subsetOf(child.outputSet)) =>
        rankBound(cond, alias.toAttribute) match {
          case Some(k) if k >= 1 && k <= Int.MaxValue =>
            val rankUsed =
              projectList.exists(_.exists(_.semanticEquals(alias.toAttribute)))
            Project(projectList,
              TopKPerKeyPlan(
                partitionSpec.map(_.asInstanceOf[AttributeReference]),
                orderSpec, // passed whole: direction AND null ordering survive
                k.toInt, child,
                // reuse the alias's exprId so the projection resolves
                // against the emitted ordinal unchanged
                if (rankUsed) Some(alias.toAttribute) else None))
          case _ => p
        }
    }
  }
}

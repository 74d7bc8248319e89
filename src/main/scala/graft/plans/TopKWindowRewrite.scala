package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the universal top-k-per-group SQL idiom
  *
  * {{{
  *   SELECT <cols-not-including-rk> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY g ORDER BY o) AS rk FROM t)
  *   WHERE rk <= k
  * }}}
  *
  * into the native [[TopKPerGroupNode]] whenever the rank column itself is
  * DISCARDED by the enclosing projection. The window formulation must
  * materialize and sort each group to number its rows; when nothing
  * downstream reads the number, that ordering work is pure waste — the
  * bounded-heap operator keeps k rows per (group, partition) with no group
  * sort at all. Spark's own InferWindowGroupLimit (3.5+) bounds the rows
  * entering the Window but still runs the Window machinery; this rule
  * removes it entirely.
  *
  * Semantics: identical output SET under the engine-wide rank contract
  * (the ORDER BY carries a unique tie-break — the same requirement
  * row_number itself needs to be deterministic). Matched conservatively:
  * exactly one window expression, a bare row_number, a non-empty
  * PARTITION BY (global top-k already plans as TakeOrderedAndProject),
  * and a sole `rk <= k` / `rk < k` / reversed literal comparison.
  *
  * Installed by [[graft.GraftExtensions]] (injectOptimizerRule) and by
  * [[graft.Sessions.tune]] via `experimental.extraOptimizations`, so both
  * spark-submit deployments and embedded sessions get it.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: org.apache.spark.sql.catalyst.expressions.Expression,
                      rk: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.exprId == rk.exprId => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.exprId == rk.exprId => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.exprId == rk.exprId => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.exprId == rk.exprId => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond, w: Window)) if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber, _), _)
            if w.partitionSpec.nonEmpty &&
              projList.forall(_.references.forall(_.exprId != alias.exprId)) =>
          limitOf(cond, alias.toAttribute) match {
            case Some(k) if k > 0 =>
              Project(projList,
                TopKPerGroupNode(w.partitionSpec, w.orderSpec, k, w.child))
            case Some(_) => // k <= 0: empty result; leave for the optimizer
              p
            case None => p
          }
        case _ => p
      }
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `filter(row_number().over(partitionBy(p).orderBy(o))
  * <= k)` → the bounded-heap [[TopKPerKeyPlan]] under the original
  * Window.
  *
  * The rewritten tree keeps the Window node (recomputing row_number
  * over the ≤k survivors per key — trivial) so every downstream
  * attribute, including the rank itself, keeps its exprId; only the
  * expensive part — ranking the full child — is replaced. Spark's own
  * InferWindowGroupLimit (3.5+) prunes rows but still sorts each
  * partition; the heap operator does not sort at all.
  *
  * Fires only on the exact safe shape: a single row_number window
  * expression, and a predicate that references nothing but the rank
  * attribute (`rn <= k`, `rn < k`, `rn = 1`). Ties must be broken by
  * the caller's orderSpec for determinism, same as the window form.
  */
object RewriteTopKWindow extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rnId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _))
      if a.exprId == rnId && k >= 1 => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, _))
      if a.exprId == rnId && k >= 2 => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, _))
      if a.exprId == rnId => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: AttributeReference)
      if a.exprId == rnId && k >= 1 => Some(k)
    case _ => None
  }

  private object RowNumberWindow {
    def unapply(p: LogicalPlan)
        : Option[(Window, ExprId, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
      p match {
        case w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(partitionSpec, orderSpec, _)), _)), _, _, child, _) =>
          Some((w, alias.exprId, partitionSpec, orderSpec, child))
        case _ => None
      }
  }

  private def passthrough(projList: Seq[NamedExpression]): Boolean =
    projList.forall(_.isInstanceOf[AttributeReference])

  /** Peel any chain of passthrough Projects (ExtractWindowExpressions
    * leaves up to two) down to the row_number window. Returns the
    * projects outermost-first plus the window parts. */
  private def peel(p: LogicalPlan, acc: List[Project])
      : Option[(List[Project], Window, ExprId, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
    p match {
      case pr @ Project(projList, child) if passthrough(projList) =>
        peel(child, pr :: acc)
      case RowNumberWindow(w, rnId, part, order, child) =>
        Some((acc.reverse, w, rnId, part, order, child))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, below) =>
      peel(below, Nil) match {
        case Some((projs, w, rnId, part, order, child))
          if part.nonEmpty && order.nonEmpty =>
          limitOf(cond, rnId) match {
            case Some(k) =>
              val newW = w.withNewChildren(
                Seq(TopKPerKeyPlan(part, order, k, child)))
              projs.reverse.foldLeft(newW: LogicalPlan) {
                (inner, pr) => pr.withNewChildren(Seq(inner))
              }
            case None => f
          }
        case _ => f
      }
  }
}

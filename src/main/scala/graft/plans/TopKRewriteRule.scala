package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.{CurrentRow, RowFrame, SpecifiedWindowFrame, UnboundedPreceding}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous top-k window idiom
  *
  *   Project(cols…)                        // rank column DISCARDED
  *     Filter(rn <= k)
  *       Window(row_number() OVER (PARTITION BY p ORDER BY o) AS rn)
  *
  * into `TopKPerKeyPlan(p, o, k)` + Project. The window formulation
  * shuffles every row and sorts whole groups to keep k; the rewrite gets
  * the bounded-heap partial/final operator (see TopKPerKey) with no query
  * change.
  *
  * Safety: fires ONLY when the rank attribute does not escape the
  * enclosing Project — if `rn` is consumed downstream the plan is left
  * alone (TopKPerKey keeps the same row set under the same ordering but
  * materializes no rank). On ties past the ordering both formulations
  * pick an arbitrary-but-valid row set, exactly like row_number itself.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def isRowNumber(e: Expression): Boolean = e match {
    case WindowExpression(ae: AggregateExpression, _) =>
      ae.aggregateFunction.prettyName == "row_number"
    case we: WindowExpression =>
      we.windowFunction.prettyName == "row_number"
    case _ => false
  }

  private def entireFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case _ => true // row_number ignores the frame; accept any
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Opt-in: the rewrite trades the window sort's disk spill for bounded
    // in-memory heaps — a memory-profile change users must ask for.
    // Only true/false parse; anything else ("1", "yes", a typo) logs a
    // loud warning and stays DISABLED. Not a throw: this rule runs on
    // EVERY logical plan in the session, so throwing would turn one
    // mistyped per-feature knob into a denial of all queries — unlike
    // the flushRows parse in the strategy, which only fires on plans
    // that actually use the operator.
    conf.getConfString(TopKPerKey.RewriteEnabledKey, "false")
        .trim.toLowerCase match {
      case "true"  => rewrite(plan)
      case "false" => plan
      case other   =>
        logWarning(s"${TopKPerKey.RewriteEnabledKey} must be true or false, " +
          s"got '$other' — top-k rewrite stays DISABLED")
        plan
    }
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
          Filter(cond,
            w @ Window(Seq(Alias(we: WindowExpression, _)), partitionSpec,
              orderSpec, child, _)))
        if isRowNumber(we) && orderSpec.nonEmpty &&
          entireFrame(we.windowSpec) =>
      val rnAttr = w.windowOutputSet.head
      val k = cond match {
        case LessThanOrEqual(a: Attribute, IntegerLiteral(n))
          if a.semanticEquals(rnAttr) => Some(n)
        case LessThan(a: Attribute, IntegerLiteral(n))
          if a.semanticEquals(rnAttr) => Some(n - 1)
        case _ => None
      }
      val rnEscapes = projectList.exists(_.references.contains(rnAttr))
      k match {
        case Some(n) if n > 0 && !rnEscapes &&
            partitionSpec.forall(_.isInstanceOf[Attribute]) =>
          Project(projectList,
            TopKPerKeyPlan(partitionSpec, orderSpec, n, child))
        case _ => p
      }
  }
}

package graft.plans

import graft.functions.GcContentExpr
import org.apache.spark.sql.catalyst.expressions.{Lower, Upper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine-specific Catalyst optimizations, injected via
  * `GraftExtensions` (`injectOptimizerRule`). SURVEY §4's stance holds —
  * Catalyst plans everything relational; the engine only adds peepholes
  * over its own expressions:
  *
  *  - [[StripCaseChangeUnderGc]]: `gc_content_native(upper(x))` ≡
  *    `gc_content_native(x)` (the expression is case-insensitive), removing
  *    a full per-row string copy from the enrichment hot path. Callers
  *    naturally write `upper(seq)` out of biology habit; the plan should
  *    not pay for it.
  */
object StripCaseChangeUnderGc extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GcContentExpr(Upper(c)) => GcContentExpr(c)
      case GcContentExpr(Lower(c)) => GcContentExpr(c)
    }
}

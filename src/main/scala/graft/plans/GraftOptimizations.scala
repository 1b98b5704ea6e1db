package graft.plans

import graft.functions.{GcContentExpr, SortedIntersectSizeExpr}
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, ArraySort, Expression, GreaterThan, If, LambdaFunction, LessThan, Literal, Lower, NamedLambdaVariable, Size, Upper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

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
  *  - [[SortedIntersectRewrite]]: `size(array_intersect(a, b))` →
  *    `sorted_intersect_size(a, b)` when both inputs are PROVABLY sorted
  *    and duplicate-free in the same expression tree.
  */
object StripCaseChangeUnderGc extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GcContentExpr(Upper(c)) => GcContentExpr(c)
      case GcContentExpr(Lower(c)) => GcContentExpr(c)
    }
}

/** `size(array_intersect(a, b))` builds a boxed hash set per row;
  * [[SortedIntersectSizeExpr]] does the same count as a primitive
  * two-pointer merge in whole-stage codegen (measured 4x on d4's pair
  * stage, r2). Users writing the naive form with `array_sort
  * (array_distinct(...))` inputs get the merge automatically.
  *
  * Soundness: the rewrite fires only when BOTH inputs are syntactically
  * `array_sort(array_distinct(_))` / `array_distinct(array_sort(_))`
  * (ascending default comparator, which array_sort is when called with
  * one argument), with non-null `bigint` elements — exactly the merge's
  * input contract. Sortedness is NOT tracked through attribute
  * references across operators; only same-tree compositions rewrite.
  */
object SortedIntersectRewrite extends Rule[LogicalPlan] {

  private def longNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  /** The RESOLVED form of array_sort's default ascending comparator over
    * non-null elements: (l, r) -> if (l < r) -1 else if (l > r) 1 else 0.
    * (With nullable elements the default comparator carries null branches
    * — but those inputs are rejected by [[longNoNulls]] anyway.)
    */
  private def isDefaultAscComparator(f: Expression): Boolean = f match {
    case LambdaFunction(
        If(LessThan(a1: NamedLambdaVariable, b1: NamedLambdaVariable),
          Literal(-1, IntegerType),
          If(GreaterThan(a2: NamedLambdaVariable, b2: NamedLambdaVariable),
            Literal(1, IntegerType), Literal(0, IntegerType))),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      a1.exprId == x.exprId && b1.exprId == y.exprId &&
        a2.exprId == x.exprId && b2.exprId == y.exprId
    case _ => false
  }

  private def sortedDistinct(e: Expression): Boolean = e match {
    case s: ArraySort if isDefaultAscComparator(s.function) =>
      s.argument match {
        case _: ArrayDistinct => longNoNulls(e)
        case _ => false
      }
    case ArrayDistinct(s: ArraySort) if isDefaultAscComparator(s.function) =>
      longNoNulls(e)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), false) if sortedDistinct(a) && sortedDistinct(b) =>
        SortedIntersectSizeExpr(a, b)
    }
}

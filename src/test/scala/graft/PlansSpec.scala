package graft

import graft.functions.GcContentExpr
import graft.plans.StripCaseChangeUnderGc
import org.apache.spark.sql.catalyst.dsl.plans._
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, Upper, Lower}
import org.apache.spark.sql.catalyst.plans.logical.{OneRowRelation, Project}
import org.scalatest.funsuite.AnyFunSuite

class PlansSpec extends AnyFunSuite {

  test("rule strips upper/lower under gc_content_native") {
    val plan = Project(
      Seq(Alias(GcContentExpr(Upper(Literal("acgt"))), "gc")()),
      OneRowRelation())
    val optimized = StripCaseChangeUnderGc(plan)
    val exprs = optimized.expressions.flatMap(_.collect { case g: GcContentExpr => g })
    assert(exprs.size == 1)
    assert(!exprs.head.child.isInstanceOf[Upper])
    // semantics preserved: both evaluate to 50.0
    assert(GcContentExpr(Upper(Literal("acgt"))).eval(null) ==
      GcContentExpr(Literal("acgt")).eval(null))
    assert(GcContentExpr(Lower(Literal("ACGT"))).eval(null) ==
      GcContentExpr(Literal("ACGT")).eval(null))
  }

  test("rule leaves other children untouched") {
    val plan = Project(
      Seq(Alias(GcContentExpr(Literal("acgt")), "gc")()),
      OneRowRelation())
    assert(StripCaseChangeUnderGc(plan) == plan)
  }
}

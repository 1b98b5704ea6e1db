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

/** SortedIntersectRewrite: the naive `size(array_intersect(...))` form
  * must be rewritten to the codegen merge exactly when sortedness is
  * provable, and agree with the unrewritten result.
  */
class SortedIntersectRewriteSpec extends org.scalatest.funsuite.AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  import org.apache.spark.sql.SparkSession

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  private def df = {
    import spark.implicits._
    // repartition keeps ConvertToLocalRelation from folding the whole
    // query into a LocalRelation before the rewrite can be observed
    Seq(
      (Seq(3L, 1L, 2L, 3L), Seq(2L, 3L, 9L)),
      (Seq(5L, 5L), Seq.empty[Long]),
      (Seq(7L, 8L), Seq(8L, 7L, 7L))).toDF("x", "y").repartition(2)
  }

  test("rewrite fires on provably sorted+distinct inputs and agrees") {
    val q = df.selectExpr(
      "size(array_intersect(array_sort(array_distinct(x)), array_sort(array_distinct(y)))) AS n")
    val optimized = q.queryExecution.optimizedPlan
    val hits = optimized.expressions.flatMap(_.collect {
      case e: graft.functions.SortedIntersectSizeExpr => e
    })
    assert(hits.nonEmpty, optimized.toString)
    assert(q.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 2, 2))
    // agreement with the unoptimized semantics on the same data
    val naive = df.selectExpr(
      "size(array_intersect(array_distinct(x), array_distinct(y))) AS n")
    assert(naive.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 2, 2))
  }

  test("no rewrite without the provable sorted+distinct shape") {
    for (e <- Seq(
        "size(array_intersect(x, y))",
        "size(array_intersect(array_sort(x), array_sort(y)))", // dups possible
        "size(array_intersect(array_distinct(x), array_distinct(y)))")) { // unsorted
      val optimized = df.selectExpr(s"$e AS n").queryExecution.optimizedPlan
      val hits = optimized.expressions.flatMap(_.collect {
        case x: graft.functions.SortedIntersectSizeExpr => x
      })
      assert(hits.isEmpty, s"unexpected rewrite for $e")
    }
  }
}

/** The PathSpanJoin planner extension (VERDICT r1 item 6): the strategy
  * must fire, the exec must agree with the builtin join composition, and
  * the plan must keep the single-shuffle shape.
  */
class PathSpanJoinSpec extends org.scalatest.funsuite.AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  import org.apache.spark.sql.functions.col

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // deterministic anchors over 30 chains: seeded RNG -> all gap sizes occur
  private def anchors = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (for {
      u <- 0 until 30
      p <- 1 to 40 if rnd.nextInt(5) < 2
    } yield (s"u$u", p.toLong)).toDF("user", "pos")
  }

  private def viaOperator = {
    graft.plans.PathSpanJoin.register(spark)
    val a1 = anchors.select(col("user"), col("pos").as("pos1"))
    val a2 = anchors.select(col("user").as("user2"), col("pos").as("pos2"))
    graft.plans.PathSpanJoin.spanJoin(a1, a2, "user", "pos1", "user2", "pos2", 2, 10)
      .select("user", "pos1", "pos2")
  }

  private def viaBuiltins = {
    val a1 = anchors.select(col("user"), col("pos").as("pos1"))
    val a2 = anchors.select(col("user").as("user2"), col("pos").as("pos2"))
    a1.join(a2, col("user") === col("user2") &&
        (col("pos2") - col("pos1")).between(2, 10))
      .select("user", "pos1", "pos2")
  }

  test("strategy fires: the physical plan contains the custom exec") {
    // TreeNode.nodeName renders PathSpanJoinExec as "PathSpanJoin"
    val plan = viaOperator.queryExecution.executedPlan.toString
    assert(plan.contains("PathSpanJoin"), plan.linesIterator.take(8).mkString("\n"))
  }

  test("operator output equals the builtin join composition (bounds inclusive)") {
    val got = viaOperator.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = viaBuiltins.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // bounds are inclusive on both ends
    assert(got.exists { case (_, p1, p2) => p2 - p1 == 2 })
    assert(got.exists { case (_, p1, p2) => p2 - p1 == 10 })
    assert(got.forall { case (_, p1, p2) => p2 - p1 >= 2 && p2 - p1 <= 10 })
  }

  test("plan shape: one exchange per side, no quadratic join") {
    val plan = viaOperator.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val nExchanges = "Exchange".r.findAllIn(plan).length
    assert(nExchanges <= 2, s"expected <=2 exchanges, got $nExchanges:\n$plan")
  }

  test("self-join on shared lineage: right side re-aliased, not mirrored") {
    // ADVICE r2: without exprId dedup, resultProj bound right attributes
    // to the left ordinal and pos2 silently mirrored pos1
    graft.plans.PathSpanJoin.register(spark)
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 3L), ("a", 8L), ("b", 2L)).toDF("user", "pos")
    val out = graft.plans.PathSpanJoin
      .spanJoin(df, df, "user", "pos", "user", "pos", 2, 10)
    val rows = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(rows == Set(("a", 1L, 3L), ("a", 1L, 8L), ("a", 3L, 8L)))
  }

  test("null chain keys never join (builtin === semantics)") {
    graft.plans.PathSpanJoin.register(spark)
    import spark.implicits._
    val df = Seq((Option("a"), 1L), (Option("a"), 3L),
      (Option.empty[String], 5L), (Option.empty[String], 7L)).toDF("user", "pos")
    val a1 = df.select(col("user"), col("pos").as("pos1"))
    val a2 = df.select(col("user").as("user2"), col("pos").as("pos2"))
    val out = graft.plans.PathSpanJoin
      .spanJoin(a1, a2, "user", "pos1", "user2", "pos2", 2, 10)
    val rows = out.select("user", "pos1", "pos2").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // the (null, 5) / (null, 7) pair has an in-range gap but must not join
    assert(rows == Set(("a", 1L, 3L)))
  }

  test("works through SparkSessionExtensions injection") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // ensure the shared context exists first
    // a FRESH session (same context) wired only via the extensions class;
    // getOrCreate returns the active session, so clear it first — and never
    // stop() s2, which would kill the shared SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // NB: "spark.sql.extensions" is a STATIC conf read from the
    // SparkContext at first creation; on a shared test context only
    // builder.withExtensions reaches a late-built session
    val s2 = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .getOrCreate()
    try {
      assert(s2 ne spark)
      import s2.implicits._
      val df = Seq(("a", 1L), ("a", 4L), ("a", 20L), ("b", 2L))
        .toDF("user", "pos")
      val a1 = df.select(col("user"), col("pos").as("pos1"))
      val a2 = df.select(col("user").as("user2"), col("pos").as("pos2"))
      val out = graft.plans.PathSpanJoin
        .spanJoin(a1, a2, "user", "pos1", "user2", "pos2", 2, 10)
      assert(out.queryExecution.executedPlan.toString.contains("PathSpanJoin"))
      val rows = out.select("user", "pos1", "pos2").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(("a", 1L, 4L)))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the mechanism behind TopK's capacity helpers: Spark's
  * ObjectHashAggregateExec falls back to SORT-BASED aggregation once a
  * task's hash map passes `spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold` distinct keys (default 128) — at which point the
  * bounded-heap TopK aggregator degenerates into a full sort of its input
  * (measured at the 30× retrieval crossover: ~31 GB of sort spill for a
  * stage whose real output is k rows per query). The teeth run first:
  * at the Spark default the fallback metric MUST fire on a >128-group
  * aggregation — if a future Spark version changes the mechanism, the
  * teeth test fails and the helpers get re-evaluated instead of
  * silently guarding against nothing.
  *
  * Suites share one forked JVM, so a prior suite's live session (its
  * builder confs: 200 shuffle partitions, AQE on) can win getOrCreate —
  * the BucketingSpec hazard. Everything this suite depends on is
  * therefore pinned via RUNTIME conf (shuffle partitioning of the
  * aggregation input via an explicit repartition on the group key, AQE
  * off via conf.set, both restored in afterAll), so groups-per-task and
  * the plan shape are deterministic regardless of which session won.
  */
class TopKFallbackSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // runtime conf, not builder conf: applies even when another suite's
    // session won getOrCreate. AQE off keeps the executed plan a plain
    // tree the ObjectHashAggregate metric traversal can read without
    // unwrapping adaptive query stages.
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  override def afterAll(): Unit = {
    spark.conf.unset("spark.sql.adaptive.enabled")
    spark.conf.unset(ConfKey)
    spark.stop()
  }

  private val ConfKey =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  // 1000 groups explicitly repartitioned onto 2 partitions by group key:
  // 500 groups per task — far past the 128-key default, comfortably under
  // the raised threshold — independent of the live session's
  // spark.sql.shuffle.partitions (the aggregation becomes a one-stage
  // partial+final over the repartitioned layout; the partial side is
  // where the per-task hash map grows).
  private def topkAgg(on: SparkSession = spark): DataFrame = {
    val rows = on.range(50000L)
      .select((col("id") % 1000).as("g"),
        (col("id") * 2654435761L % 997).cast("double").as("score"),
        col("id"))
      .repartition(2, col("g"))
    rows.groupBy(col("g"))
      .agg(graft.functions.TopK.udaf(5)(col("score"), col("id")).as("top"))
  }

  /** Sum of the sort-fallback-task metric over every ObjectHashAggregate
    * in the executed plan (partial + final), after running the frame.
    */
  private def fallbackTasks(df: DataFrame): Long = {
    // collect(), not a noop write: a write wraps the plan in its own
    // QueryExecution, leaving THIS df's plan (and its metrics) unexecuted
    df.collect(): Unit
    val aggs = df.queryExecution.executedPlan.collect {
      case o: ObjectHashAggregateExec => o
    }
    assert(aggs.nonEmpty,
      "TopK must plan as ObjectHashAggregate — traversal found none:\n" +
        df.queryExecution.executedPlan)
    aggs.map(_.metrics("numTasksFallBacked").value).sum
  }

  test("teeth: at Spark's default threshold a >128-group TopK agg sort-falls-back") {
    spark.conf.unset(ConfKey)
    assert(fallbackTasks(topkAgg()) > 0,
      "expected the 128-key default to trigger sort fallback — if this " +
        "stops firing, Spark changed the mechanism and TopK's capacity " +
        "helpers need re-evaluation")
  }

  test("sessionWithHashAggCapacity keeps the same aggregation fully hash-based") {
    spark.conf.unset(ConfKey)
    val scoped = graft.functions.TopK.sessionWithHashAggCapacity(spark)
    assert(scoped.conf.get(ConfKey) ==
      graft.functions.TopK.RaisedFallbackThreshold.toString)
    assert(fallbackTasks(topkAgg(on = scoped)) == 0L,
      "raised threshold must keep the bounded-heap aggregation in the hash map")
  }

  test("the scoped raise never leaks into the caller's session") {
    spark.conf.unset(ConfKey)
    val scoped = graft.functions.TopK.sessionWithHashAggCapacity(spark)
    assert(scoped ne spark, "an untouched session must be cloned, not mutated")
    // parent still at the Spark default: its unbounded object aggs
    // (collect_list / collect_set) keep the 128-key memory-safety valve
    assert(spark.conf.getOption(ConfKey).forall(_ == "128"),
      s"caller's session threshold changed: ${spark.conf.getOption(ConfKey)}")
    // and the clone shares the SparkContext (same executors, same cache)
    assert(scoped.sparkContext eq spark.sparkContext)
    // a frame built on the clone still evaluates with the raise even if
    // built before unrelated conf churn on the parent
    spark.conf.set(ConfKey, "4096")
    try assert(fallbackTasks(topkAgg(on = scoped)) == 0L,
      "clone's conf must govern the clone-built plan's execution")
    finally spark.conf.unset(ConfKey)
  }

  test("the scoped clone is cached per parent and re-syncs parent conf on access") {
    // cloneSession + lazy SessionState init cost ~0.5 s (measured: d5b
    // build+run 1.16 s with a per-build clone vs 0.59 s warm), so the
    // helper must reuse one clone per parent — and keep it semantically
    // fresh by mirroring the parent's runtime conf on every access
    spark.conf.unset(ConfKey)
    val a = graft.functions.TopK.sessionWithHashAggCapacity(spark)
    val b = graft.functions.TopK.sessionWithHashAggCapacity(spark)
    assert(a eq b, "repeated access must reuse the cached clone")
    spark.conf.set("graft.spec.probe", "42")
    try {
      val c = graft.functions.TopK.sessionWithHashAggCapacity(spark)
      assert(c eq a)
      assert(c.conf.get("graft.spec.probe") == "42",
        "a conf set on the parent between builds must reach the clone")
      spark.conf.unset("graft.spec.probe")
      assert(graft.functions.TopK.sessionWithHashAggCapacity(spark)
        .conf.getOption("graft.spec.probe").isEmpty,
        "a conf dropped on the parent must unset in the clone")
    } finally spark.conf.unset("graft.spec.probe")
  }

  test("an explicit non-default session threshold is respected by both helpers") {
    spark.conf.set(ConfKey, "4096")
    try {
      assert(graft.functions.TopK.sessionWithHashAggCapacity(spark) eq spark,
        "a deliberate override must short-circuit the clone")
      graft.functions.TopK.ensureHashAggCapacity(spark)
      assert(spark.conf.get(ConfKey) == "4096",
        "a deliberate session override must survive the helper")
    } finally spark.conf.unset(ConfKey)
  }

  test("ensureHashAggCapacity (session-wide user posture) raises in place") {
    spark.conf.unset(ConfKey)
    graft.functions.TopK.ensureHashAggCapacity(spark)
    try assert(spark.conf.get(ConfKey) ==
      graft.functions.TopK.RaisedFallbackThreshold.toString)
    finally spark.conf.unset(ConfKey)
  }

  test("hash-based and sort-fallback paths agree on the answer") {
    // the capacity helpers are a performance guard, not a semantics
    // change: the same aggregation run both ways returns identical
    // top-k lists
    spark.conf.unset(ConfKey)
    val viaFallback = topkAgg().orderBy(col("g")).collect()
    val scoped = graft.functions.TopK.sessionWithHashAggCapacity(spark)
    val viaHash = topkAgg(on = scoped).orderBy(col("g")).collect()
    assert(viaFallback.sameElements(viaHash))
  }

  test("ordered insert matches brute-force sort-take-k over random streams and merges") {
    // r13 replaced the per-row sortWith re-sort (O(k log k) + a sort
    // allocation per input row) with a one-pass O(k) ordered insert and
    // an O(k) sorted merge. Property: for arbitrary streams, arbitrary
    // partition splits and arbitrary k, reduce-then-merge equals the
    // brute-force "sort everything, take k" reference — including the
    // sorted output order finish() now relies on.
    val rnd = new scala.util.Random(20260816L)
    def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    for (trial <- 0 until 200) {
      val k = 1 + rnd.nextInt(8)
      val agg = graft.functions.TopK.aggregator(k)
      val n = rnd.nextInt(60)
      // duplicate scores (and occasionally duplicate ids) stress ties
      val xs = Vector.fill(n)((rnd.nextInt(6).toDouble, rnd.nextInt(20).toLong))
      val nSplits = 1 + rnd.nextInt(4)
      val parts = xs.grouped(math.max(1, math.ceil(xs.size / nSplits.toDouble).toInt))
        .toList.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = parts match {
        case Nil => agg.zero
        case h :: t => t.foldLeft(h)(agg.merge)
      }
      val got = agg.finish(merged)
      val want = xs.sortWith(better).take(k)
      assert(got == want, s"trial $trial k=$k xs=$xs")
    }
  }

  test("aggregator rejects k <= 0 at construction and survives very large k") {
    // k = 0 used to return Nil from the trim shape; the ordered-insert
    // fast-reject would instead read Nil.last per row — the contract is
    // now explicit at construction, not a per-row crash
    intercept[IllegalArgumentException](graft.functions.TopK.aggregator(0))
    intercept[IllegalArgumentException](graft.functions.TopK.aggregator(-3))
    // the insert walk is iterative: a k in the millions must not blow
    // the stack (the recursive shape grew one frame per buffer element)
    val agg = graft.functions.TopK.aggregator(5000000)
    val buf = (0 until 200000).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, (i.toDouble, i.toLong)))
    assert(buf.length == 200000 && buf.head._1 == 199999.0)
    // and the worst case for the walk itself: insert at the very tail
    // of a long full-ish buffer
    assert(agg.reduce(buf, (-1.0, 7L)).last == ((-1.0, 7L)))
  }

  test("syncConf keeps clone conf identical to parent under random set/unset churn") {
    // VERDICT r13 #6: the set/unset reconciliation swallows exceptions;
    // a key that silently failed to sync would leave the cached clone
    // diverging from the parent. Property: after ANY sequence of runtime
    // set/unset operations on the parent, a fresh access returns a clone
    // whose conf equals the parent's except the raised threshold key.
    spark.conf.unset(ConfKey)
    val keys = (0 until 5).map(i => s"graft.prop.churn$i")
    val rnd = new scala.util.Random(20260817L)
    try {
      for (trial <- 0 until 100) {
        val ops = 1 + rnd.nextInt(6)
        for (_ <- 0 until ops) {
          val k = keys(rnd.nextInt(keys.length))
          if (rnd.nextBoolean()) spark.conf.set(k, rnd.nextInt(1000).toString)
          else spark.conf.unset(k)
        }
        val scoped = graft.functions.TopK.sessionWithHashAggCapacity(spark)
        val p = spark.conf.getAll - ConfKey
        val s = scoped.conf.getAll - ConfKey
        assert(s == p,
          s"trial $trial: clone conf diverged from parent\n" +
            s"only in clone: ${(s.toSet -- p.toSet).take(5)}\n" +
            s"only in parent: ${(p.toSet -- s.toSet).take(5)}")
        assert(scoped.conf.get(ConfKey) ==
          graft.functions.TopK.RaisedFallbackThreshold.toString)
      }
    } finally keys.foreach(spark.conf.unset)
  }
}

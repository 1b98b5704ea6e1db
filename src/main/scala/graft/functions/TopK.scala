package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed Aggregator — the scale-correct shape
  * of "rank ≤ k per key".
  *
  * The window formulation (`row_number() over (partition by k order by s)
  * <= k`) sorts every group's full row set after shuffling it; this
  * aggregator keeps a bounded buffer per key with map-side combine, so at
  * most k rows per key *per input partition* cross the shuffle, and nothing
  * is ever fully sorted. At 100 TB (ANN top-k over billions of candidate
  * pairs) that is the difference between a shuffle of k·partitions rows
  * and a shuffle of the entire candidate set.
  *
  * Ties break on ascending id (matching d5's `orderBy(cos desc, vec_id)`).
  */
object TopK {

  type Scored = (Double, Long) // (score, id)

  private val FallbackConfKey =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  private val SparkDefault = "128"

  /** Threshold the capacity helpers raise a session to: 2^20 groups per
    * task. TopK state is ~(k+1)·16 B per group plus map overhead, so a
    * FULL map at this threshold is on the order of 100–200 MB per task —
    * bounded, unlike the unbounded collect_list buffers the Spark
    * default protects against. A workload with more than ~1M distinct
    * groups PER TASK should pre-partition on the group key instead
    * (each task then sees only its own groups).
    */
  val RaisedFallbackThreshold: Int = 1 << 20

  /** The session to build a bounded-heap TopK aggregation on.
    *
    * ObjectHashAggregateExec (the physical operator behind every typed
    * Aggregator UDAF) falls back to SORT-BASED aggregation the moment a
    * task's hash map exceeds `spark.sql.objectHashAggregate.sortBased.
    * fallbackThreshold` distinct keys — Spark's default is 128, sized
    * for aggregation buffers that grow without bound (collect_list).
    * For [[aggregator]] the fallback is pure loss: the buffer is
    * bounded at k entries by construction, and the fallback SORTS the
    * full remaining input by group key — the exact full-candidate sort
    * this Aggregator exists to avoid. Measured at the 30× retrieval
    * crossover: the dense leg's ~2B-row candidate stream spilled 31 GB
    * of sort runs to disk because the query side held 15k > 128 groups
    * (scaling_x12_out.json / the x12diag stage dump).
    *
    * The raise is SCOPED, not session-wide (r13, on r12 advice): the
    * returned session is a state clone of the caller's (same
    * SparkContext, SharedState, block-manager cache; copied runtime
    * confs and temp functions) with only the fallback threshold raised.
    * SQLConf is read from the plan's OWN session at execution time, so
    * every frame built from the returned session carries the raise
    * through execution no matter who runs it or when — and the caller's
    * session keeps Spark's 128-key memory-safety valve for genuinely
    * unbounded object aggregations (collect_list / collect_set) that
    * share it. Build the WHOLE query from the returned session: a frame
    * mixed from both sessions executes under the conf of whichever
    * session owns the root Dataset.
    *
    * A session whose threshold was explicitly set away from the Spark
    * default is returned unchanged (a deliberate override — including a
    * deliberately re-set 128 being indistinguishable from untouched —
    * is respected; set any non-default value to opt out).
    *
    * The clone is CACHED per parent session and reused: cloneSession +
    * the clone's lazy SessionState materialization cost a measured
    * ~0.5 s on first use, which a fresh clone per plan build would pay
    * on every bench rep / repeated query construction (r13 CloneProbe:
    * d5b build+run 1.16 s with a per-build clone vs 0.59 s on a warm
    * session). To keep the cached clone semantically equivalent to a
    * fresh one, every access re-syncs the parent's runtime conf into
    * the clone (sets diffs, unsets keys the parent dropped, never
    * touching the raised threshold key) — a conf the user changes on
    * the parent between builds is still honored by the next build.
    */
  def sessionWithHashAggCapacity(spark: SparkSession): SparkSession =
    if (spark.conf.get(FallbackConfKey, SparkDefault) != SparkDefault) spark
    else scopedSessions.synchronized {
      // evict clones of stopped parents first: the clone's SessionState
      // strongly reaches its parent (cloneSession keeps the parent
      // state's builder closures), so the WeakHashMap KEY never becomes
      // weakly reachable while its value lives — without this sweep a
      // process cycling getOrCreate/stop (test JVMs) accumulates one
      // dead (parent, clone) pair per cycle for the JVM lifetime. The
      // clone shares the parent's SparkContext, so parent-stopped ⇒
      // context-stopped ⇒ the cached clone is unusable anyway.
      scopedSessions.entrySet().removeIf(e => e.getKey.sparkContext.isStopped)
      val scoped = Option(scopedSessions.get(spark)).getOrElse {
        val c = org.apache.spark.sql.GraftSqlShim.cloneSession(spark)
        scopedSessions.put(spark, c)
        c
      }
      syncConf(spark, scoped)
      scoped.conf.set(FallbackConfKey, RaisedFallbackThreshold.toString)
      scoped
    }

  // WeakHashMap + the stopped-parent sweep above: the few long-lived
  // sessions a process holds (Verify/Bench: one) cache one clone each,
  // and stopped parents are evicted on the next access. Guarded by its
  // own lock — SparkSession access is cheap, creation rare.
  private val scopedSessions =
    new java.util.WeakHashMap[SparkSession, SparkSession]()

  /** Make the cached clone's runtime conf mirror the parent's (except the
    * raised threshold key): set entries that differ, unset entries the
    * parent no longer carries. Static confs throw on set — skipped; they
    * cannot diverge between sessions sharing one SparkContext anyway.
    */
  private def syncConf(parent: SparkSession, scoped: SparkSession): Unit = {
    val p = parent.conf.getAll
    val s = scoped.conf.getAll
    p.foreach { case (k, v) =>
      if (k != FallbackConfKey && !s.get(k).contains(v))
        try scoped.conf.set(k, v) catch { case _: Exception => () }
    }
    (s.keySet -- p.keySet - FallbackConfKey).foreach { k =>
      try scoped.conf.unset(k) catch { case _: Exception => () }
    }
  }

  /** Session-WIDE variant of [[sessionWithHashAggCapacity]]: raises the
    * given session's fallback threshold in place. This is the documented
    * posture for USER code that aggregates with [[udaf]] on its own
    * session and wants every TopK it builds covered without threading a
    * cloned session around — at the cost of also raising the valve for
    * any unbounded object aggregation (collect_list/collect_set) run on
    * the same session afterwards, up to [[RaisedFallbackThreshold]]
    * growing buffers per task before sort fallback. The engine's own
    * call sites use the scoped variant instead. Same override semantics:
    * only a session still at the Spark default is touched. NOTE the conf
    * is read at EXECUTION time — the raise must still be in effect when
    * the frame actually runs, not just when it is built.
    */
  def ensureHashAggCapacity(spark: SparkSession): Unit =
    if (spark.conf.get(FallbackConfKey, SparkDefault) == SparkDefault)
      spark.conf.set(FallbackConfKey, RaisedFallbackThreshold.toString)

  /** Keep the k largest by (score desc, id asc).
    *
    * Buffer invariant: SORTED by [[aggregator.better]] (best first) and
    * at most k long — maintained by a one-pass O(k) ordered insert
    * ([[reduce]]) and an O(k) sorted-list merge ([[merge]]), so `finish`
    * is the identity. The earlier shape re-sorted the ≤(k+1)-element
    * buffer per input row (O(k log k) + a sort allocation per row); on
    * the dominant path of a long candidate stream — buffer full, new
    * element no better than the current worst — the insert now returns
    * the buffer untouched: one O(k) traversal, zero allocation.
    */
  def aggregator(k: Int): Aggregator[Scored, List[Scored], Seq[Scored]] = {
    // k ≤ 0 has no meaningful top-k; the old trim shape returned Nil but
    // the fast-reject below would read Nil.last on an empty full-at-0
    // buffer — fail at construction, not per-row
    require(k > 0, s"top-k needs k > 0, got $k")
    new Aggregator[Scored, List[Scored], Seq[Scored]] {

      private def better(a: Scored, b: Scored): Boolean =
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

      /** One-pass insert of `a` into the sorted, ≤k buffer `xs` —
        * iterative (a recursive walk would grow the stack to k frames;
        * user-supplied k is unbounded).
        */
      private def insert(xs: List[Scored], a: Scored): List[Scored] = {
        // fast reject: buffer already full and `a` is no better than the
        // current worst element — the steady state on a long stream
        // (xs.nonEmpty is implied by k > 0 when the length check passes,
        // but the guard keeps Nil.last structurally unreachable)
        if (xs.nonEmpty && xs.lengthCompare(k) >= 0 && !better(a, xs.last)) xs
        else {
          val out = List.newBuilder[Scored]
          var rest = xs
          var taken = 0
          // copy the elements that stay ahead of `a`
          while (taken < k && rest.nonEmpty && !better(a, rest.head)) {
            out += rest.head; rest = rest.tail; taken += 1
          }
          if (taken < k) {
            out += a; taken += 1
            while (taken < k && rest.nonEmpty) {
              out += rest.head; rest = rest.tail; taken += 1
            }
          }
          out.result()
        }
      }

      /** Merge two sorted ≤k buffers into the sorted top-k of their union. */
      private def mergeSorted(x: List[Scored], y: List[Scored]): List[Scored] = {
        val out = List.newBuilder[Scored]
        var n = 0
        var a = x
        var b = y
        while (n < k && a.nonEmpty && b.nonEmpty) {
          if (better(b.head, a.head)) { out += b.head; b = b.tail }
          else { out += a.head; a = a.tail }
          n += 1
        }
        var rest = if (a.isEmpty) b else a
        while (n < k && rest.nonEmpty) { out += rest.head; rest = rest.tail; n += 1 }
        out.result()
      }

      override def zero: List[Scored] = Nil
      override def reduce(b: List[Scored], a: Scored): List[Scored] =
        insert(b, a) // bounded: never holds more than k
      override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
        mergeSorted(b1, b2)
      override def finish(r: List[Scored]): Seq[Scored] = r // already sorted
      override def bufferEncoder: Encoder[List[Scored]] = Encoders.kryo[List[Scored]]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
  }

  /** Memoized per k (r15): `functions.udaf(aggregator(k))` wraps a FRESH
    * anonymous Aggregator instance, and the resulting ScalaAggregator
    * expression compares by the instance's reference equality — so two
    * plan builds of the *same* query were never `sameResult`. Any
    * cached frame whose subtree contains the UDAF (bm25Top5's shared
    * head, d23's sketch) then MISSES the CacheManager lookup on every
    * re-build and re-materializes per bench rep (measured: d15 warm
    * reps 2.1–2.4 s vs the 0.65 s quiet floor; x12b/c/d flat ~2×).
    * The Aggregator is stateless (buffers are passed explicitly), so
    * one shared instance per k is safe, and plans built at different
    * times now canonicalize equal.
    */
  private val udafCache = new java.util.concurrent.ConcurrentHashMap[
    Int, org.apache.spark.sql.expressions.UserDefinedFunction]()

  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udafCache.computeIfAbsent(k,
      kk => org.apache.spark.sql.functions.udaf(aggregator(kk)))
}

package graft

import graft.operators.PrefixJoin
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The prefix filter is LOSSLESS — the joined output must be identical to
  * the exhaustive blocked quadratic join, not merely high-recall.
  */
class PrefixJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // 300 docs over 3 blocks; tokens drawn from a small pool so overlap
  // levels span the whole [0,1] Jaccard range, plus planted near-dups
  private def docRows: Seq[(Long, String, Seq[Long])] = {
    val rnd = new scala.util.Random(7)
    val pool = (1L to 60L).map(t => t * 7919L)
    val base = (0 until 280).map { i =>
      val k = 5 + rnd.nextInt(12)
      val toks = rnd.shuffle(pool).take(k).distinct.sorted
      (i.toLong, s"b${i % 3}", toks)
    }
    // planted near-duplicates: copy with one token changed (same block)
    val dups = (0 until 20).map { j =>
      val (id, blk, toks) = base(j * 10)
      val mutated = (toks.drop(1) :+ (99991L + j)).distinct.sorted
      (1000L + j, blk, mutated)
    }
    base ++ dups
  }

  private def docsDf = {
    import spark.implicits._
    docRows.toDF("doc_id", "blk", "g")
  }

  private def exhaustive(threshold: Double): Set[(String, Long, Long, Double)] = {
    val rows = docRows
    (for {
      a <- rows; b <- rows
      if a._2 == b._2 && a._1 < b._1
    } yield {
      val (s1, s2) = (a._3.toSet, b._3.toSet)
      val inter = (s1 & s2).size
      val j = inter.toDouble / (s1.size + s2.size - inter)
      (a._2, a._1, b._1, j)
    }).filter(_._4 >= threshold).toSet
  }

  test("output identical to the exhaustive blocked join (t=0.35)") {
    val got = PrefixJoin.jaccardPairs(docsDf, "doc_id", "g", Seq("blk"), 0.35)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = exhaustive(0.35)
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce qualifying pairs")
  }

  test("output identical at a high threshold (t=0.8, planted dups)") {
    val got = PrefixJoin.jaccardPairs(docsDf, "doc_id", "g", Seq("blk"), 0.8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = exhaustive(0.8)
    assert(got == want)
    assert(want.size >= 10, s"planted dups must survive t=0.8, got ${want.size}")
  }

  test("positional filter never changes the output (both thresholds)") {
    // the ICDE'08 positional filter prunes only the candidate stage;
    // the measurement-only positionalFilter=false path must verify to
    // the exact same pair set at a loose threshold (cap rarely binds)
    // and a tight one (cap binds hard — the filter's design regime)
    for (t <- Seq(0.35, 0.8)) {
      val on = PrefixJoin.jaccardPairs(docsDf, "doc_id", "g", Seq("blk"), t,
          positionalFilter = true)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val off = PrefixJoin.jaccardPairs(docsDf, "doc_id", "g", Seq("blk"), t,
          positionalFilter = false)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(on == off, s"positional filter changed output at t=$t")
    }
  }

  test("plan has no cartesian/broadcast-nested-loop join") {
    val plan = PrefixJoin.jaccardPairs(docsDf, "doc_id", "g", Seq("blk"), 0.35)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(10).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("empty token sets never pair") {
    import spark.implicits._
    val df = Seq((1L, "b", Seq.empty[Long]), (2L, "b", Seq.empty[Long]),
      (3L, "b", Seq(5L, 6L))).toDF("doc_id", "blk", "g")
    assert(PrefixJoin.jaccardPairs(df, "doc_id", "g", Seq("blk"), 0.35).count() == 0)
  }

  test("auto-dispatch routes a dense-vocab corpus to the quadratic, NO conf set") {
    // the r10 scale hazard: a small token pool makes every df-ordered
    // prefix token common, so the prefix candidate stage approaches the
    // in-block cross product (230 GB spill at 150k docs, measured twice).
    // The router must see that from the probe alone — no
    // graft.d4.maxExactRows, no human reading SCALING.md — and still
    // return the exact pair set.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pool = (1L to 12L).map(_ * 104729L) // 12 tokens: every prefix token common
    val rows = (0 until 240).map { i =>
      val k = 6 + rnd.nextInt(4)
      (i.toLong, s"b${i % 2}", rnd.shuffle(pool).take(k).distinct.sorted)
    }
    val df = rows.toDF("doc_id", "blk", "g")
    val auto = PrefixJoin.jaccardPairsAuto(df, "doc_id", "g", Seq("blk"), 0.35)
    assert(auto.choseQuadratic,
      s"dense corpus must route quadratic: ${auto.probe}")
    assert(auto.probe.prefixCandidates >= auto.probe.blockPairs / 2,
      s"fixture must actually be dense: ${auto.probe}")
    // exact output regardless of route
    val want = (for {
      a <- rows; b <- rows if a._2 == b._2 && a._1 < b._1
      s1 = a._3.toSet; s2 = b._3.toSet
      inter = (s1 & s2).size
      j = inter.toDouble / (s1.size + s2.size - inter) if j >= 0.35
    } yield (a._2, a._1, b._1, j)).toSet
    val got = auto.pairs.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
    assert(want.nonEmpty, "dense fixture must produce qualifying pairs")
  }

  test("auto-dispatch keeps an open-vocab corpus on the prefix index") {
    // rare tokens (pool >> corpus token volume) are the regime the
    // prefix filter was designed for: candidate volume collapses and the
    // router must keep the near-linear branch
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 240).map { i =>
      val toks = Seq.fill(10)(1L + rnd.nextInt(1000000).toLong)
        .map(_ * 7919L).distinct.sorted
      (i.toLong, s"b${i % 2}", toks)
    }
    val df = rows.toDF("doc_id", "blk", "g")
    val auto = PrefixJoin.jaccardPairsAuto(df, "doc_id", "g", Seq("blk"), 0.35)
    assert(!auto.choseQuadratic,
      s"open-vocab corpus must keep the prefix index: ${auto.probe}")
    assert(auto.probe.prefixCandidates < auto.probe.blockPairs / 2)
    // and the two routes agree on the output (here: near-certainly empty
    // overlap — assert equality rather than emptiness to stay honest)
    val viaQuad = PrefixJoin.quadraticPairs(df, "doc_id", "g", Seq("blk"), 0.35)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val got = auto.pairs.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == viaQuad)
  }

  test("ceil slack keeps exact boundary-threshold pairs (t = 0.07)") {
    // 100·0.07 = 7.000000000000001 in doubles: a slack-free ceil reads 8,
    // so the size filter demands |g2| ≥ 8 and the prefix length cuts one
    // token short — the (100, 7)-sized subset pair whose true Jaccard is
    // exactly 0.07 = t gets dropped in BOTH branches before the exact
    // verification can see it. Branch bit-identity alone cannot catch
    // this (both branches shared the slack-free formulation); only
    // brute-force comparison does.
    import spark.implicits._
    val big = (1L to 100L).map(_ * 13L)
    val small = big.take(7)
    val df = Seq((1L, "b", big), (2L, "b", small)).toDF("doc_id", "blk", "g")
    for ((tag, got) <- Seq(
        "quadratic" -> PrefixJoin.quadraticPairs(df, "doc_id", "g", Seq("blk"), 0.07),
        "prefix" -> PrefixJoin.jaccardPairs(df, "doc_id", "g", Seq("blk"), 0.07))) {
      val rows = got.collect()
      assert(rows.length == 1, s"$tag dropped the boundary pair")
      assert(rows(0).getDouble(3) == 0.07, s"$tag jaccard ${rows(0).getDouble(3)}")
    }
  }

  test("density probe arithmetic matches brute force on the main fixture") {
    // the router's evidence must be the number it claims: blockPairs =
    // sum of n*(n-1)/2 per block; prefixCandidates = sum of c*(c-1)/2
    // per (block, prefix token) where each doc's prefix is the first
    // |s| - ceil(t*|s|) + 1 tokens of its (df, tok)-sorted set — the
    // same derivation the candidate stage explodes
    val t = 0.35
    val probe = PrefixJoin.densityProbe(docsDf, "doc_id", "g", Seq("blk"), t)
    val rows = docRows
    assert(probe.nDocs == rows.size)
    val wantBlockPairs = rows.groupBy(_._2).values
      .map(b => b.size.toLong * (b.size - 1) / 2).sum
    assert(probe.blockPairs == wantBlockPairs)
    val df = rows.flatMap(r => r._3.map(tk => tk)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val wantCand = rows
      .flatMap { case (_, blk, toks) =>
        // mirror the engine's slack-guarded ceil (see PrefixJoin)
        val plen = toks.size - math.ceil(toks.size * t - 1e-9).toInt + 1
        toks.sortBy(tk => (df(tk), tk)).take(plen).map(tk => (blk, tk))
      }
      .groupBy(identity).values
      .map(c => c.size.toLong * (c.size - 1) / 2).sum
    assert(probe.prefixCandidates == wantCand,
      s"probe=${probe.prefixCandidates} brute=$wantCand")
  }

  test("auto-dispatch fails fast past the quadratic ceiling, naming d2") {
    import spark.implicits._
    val pool = (1L to 8L).map(_ * 104729L)
    val rnd = new scala.util.Random(17)
    val rows = (0 until 120).map { i =>
      (i.toLong, "b0", rnd.shuffle(pool).take(5).distinct.sorted)
    }
    val df = rows.toDF("doc_id", "blk", "g")
    val e = intercept[IllegalStateException] {
      PrefixJoin.jaccardPairsAuto(df, "doc_id", "g", Seq("blk"), 0.35,
        maxQuadraticPairs = 100L)
    }
    assert(e.getMessage.contains("d2_minhash_lsh"), e.getMessage)
    assert(e.getMessage.contains("dense"), e.getMessage)
    // the generic API's remediation is worded on the PARAMETER — a
    // non-d4 caller must never be told to set a d4 conf that won't
    // affect its call site (r11 ADVICE)
    assert(e.getMessage.contains("maxQuadraticPairs"), e.getMessage)
    assert(!e.getMessage.contains("graft.d4"), e.getMessage)
    // a caller WITH a conf-backed ceiling appends its own hint
    val e2 = intercept[IllegalStateException] {
      PrefixJoin.jaccardPairsAuto(df, "doc_id", "g", Seq("blk"), 0.35,
        maxQuadraticPairs = 100L, ceilingHint = "set graft.d4.maxQuadraticPairs")
    }
    assert(e2.getMessage.contains("graft.d4.maxQuadraticPairs"), e2.getMessage)
  }

  test("sparse pre-probe skips the exact prefix pass on open-vocab corpora") {
    // the r12 probe-cost fix: when the all-token candidate bound (one
    // cheap explode + aggregate) is already below the dense threshold,
    // the df-join + per-doc-sort exact pass never runs. The routing
    // decision is pinned by the bound's DIRECTION (it can only
    // overestimate density), and exactPrefixCount records which path ran.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val sparseRows = (0 until 240).map { i =>
      val toks = Seq.fill(10)(1L + rnd.nextInt(1000000).toLong)
        .map(_ * 7919L).distinct.sorted
      (i.toLong, s"b${i % 2}", toks)
    }
    val sparse = PrefixJoin.jaccardPairsAuto(
      sparseRows.toDF("doc_id", "blk", "g"), "doc_id", "g", Seq("blk"), 0.35)
    assert(!sparse.choseQuadratic)
    assert(!sparse.probe.exactPrefixCount,
      s"open-vocab corpus must short-circuit on the pre-probe: ${sparse.probe}")
    // the reported prefixCandidates is then the all-token bound —
    // verify its arithmetic against brute force
    val wantBound = sparseRows
      .flatMap { case (_, blk, toks) => toks.map(tk => (blk, tk)) }
      .groupBy(identity).values
      .map(c => c.size.toLong * (c.size - 1) / 2).sum
    assert(sparse.probe.prefixCandidates == wantBound,
      s"bound=${sparse.probe.prefixCandidates} brute=$wantBound")
    // a dense corpus falls through to the exact probe (the pre-probe
    // cannot prove it sparse) and exactPrefixCount records that
    val pool = (1L to 12L).map(_ * 104729L)
    val denseRows = (0 until 240).map { i =>
      val k = 6 + rnd.nextInt(4)
      (i.toLong, s"b${i % 2}", rnd.shuffle(pool).take(k).distinct.sorted)
    }
    val dense = PrefixJoin.jaccardPairsAuto(
      denseRows.toDF("doc_id", "blk", "g"), "doc_id", "g", Seq("blk"), 0.35)
    assert(dense.choseQuadratic)
    assert(dense.probe.exactPrefixCount, s"dense corpus: ${dense.probe}")
  }

  test("above maxExactRows the FIRST d4 plan build runs probe jobs; snapshot-cached rebuilds run zero") {
    // the explicit exception to the zero-jobs-at-plan-build contract
    // (r11 ADVICE): jaccardPairsAuto's probe is eager — routing must see
    // the evidence before committing to a join — so the FIRST plan built
    // above graft.d4.maxExactRows for a given snapshot pays the probe's
    // linear aggregates at BUILD time. Below the threshold (the next
    // test) the build stays job-free; the r12 sparse pre-probe bounds
    // the eager cost at two cheap aggregates on open-vocabulary corpora;
    // and since r13 the DECISION is cached per immutable snapshot, so
    // every REBUILD over the same testdata dir (explain, audits, bench
    // reps 2..N) is job-free again — the exception is paid once per
    // (app, snapshot, routing params), not once per plan construction.
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    Tables.documents(spark, "/root/testdata/sf0.001").queryExecution.analyzed
    Thread.sleep(300)
    PrefixJoin.clearRouteCache() // cold cache regardless of suite order
    spark.conf.set("graft.d4.maxExactRows", "1")
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries("d4_ngram_jaccard")(spark, "/root/testdata/sf0.001")
        .queryExecution.analyzed
      Thread.sleep(500)
      assert(jobs > 0,
        "above maxExactRows the router must probe before committing to a join")
      jobs = 0
      val rebuilt = SparkEntry.queries("d4_ngram_jaccard")(spark, "/root/testdata/sf0.001")
      rebuilt.queryExecution.analyzed
      Thread.sleep(500)
      assert(jobs == 0,
        s"rebuilding the d4 plan over the same snapshot launched $jobs " +
          "probe jobs — the r13 routing cache must make rebuilds job-free")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.unset("graft.d4.maxExactRows")
      PrefixJoin.clearRouteCache()
    }
  }

  test("snapshot-cached routing returns the same decision and identical pairs") {
    // the cache must be invisible semantically: same probe evidence, same
    // route, same rows as the uncached call — and a changed routing param
    // is a different cache key (a conf change re-probes, never reuses)
    PrefixJoin.clearRouteCache()
    try {
      val uncached = PrefixJoin.jaccardPairsAuto(
        docsDf, "doc_id", "g", Seq("blk"), 0.35)
      val first = PrefixJoin.jaccardPairsAuto(
        docsDf, "doc_id", "g", Seq("blk"), 0.35, snapshotKey = Some("spec:fixture"))
      val cached = PrefixJoin.jaccardPairsAuto(
        docsDf, "doc_id", "g", Seq("blk"), 0.35, snapshotKey = Some("spec:fixture"))
      assert(first.probe == uncached.probe)
      assert(cached.probe == first.probe)
      assert(cached.choseQuadratic == uncached.choseQuadratic)
      val want = uncached.pairs.collect().map(_.toSeq).toSet
      assert(cached.pairs.collect().map(_.toSeq).toSet == want)
      // different denseRatio → different key → fresh (possibly different)
      // decision, not a stale reuse of the 0.5-ratio entry
      val forced = PrefixJoin.jaccardPairsAuto(
        docsDf, "doc_id", "g", Seq("blk"), 0.35, denseRatio = 1e9,
        snapshotKey = Some("spec:fixture"))
      assert(!forced.choseQuadratic,
        "an absurd denseRatio must force the prefix branch even with a cached 0.5-ratio decision present")
    } finally PrefixJoin.clearRouteCache()
  }

  test("route-cache key includes the token column: same snapshot, different column re-probes") {
    // ADVICE r13: the key carried threshold/ratio/ceiling/blocks but not
    // id/token columns — two calls over the same snapshotKey with
    // different token columns would silently reuse a routing decision
    // made for DIFFERENT data. Pin it with one frame carrying a dense
    // column (12-token pool → quadratic) and a sparse one (open vocab →
    // prefix): under one snapshotKey the two calls must reach opposite
    // routes, which a key collision makes impossible.
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val pool = (1L to 12L).map(_ * 104729L)
    val rows = (0 until 240).map { i =>
      val dense = rnd.shuffle(pool).take(6 + rnd.nextInt(4)).distinct.sorted
      val sparse = Seq.fill(10)(1L + rnd.nextInt(1000000).toLong)
        .map(_ * 7919L).distinct.sorted
      (i.toLong, s"b${i % 2}", dense, sparse)
    }
    val df = rows.toDF("doc_id", "blk", "g_dense", "g_sparse")
    PrefixJoin.clearRouteCache()
    try {
      val dense = PrefixJoin.jaccardPairsAuto(
        df, "doc_id", "g_dense", Seq("blk"), 0.35, snapshotKey = Some("spec:cols"))
      assert(dense.choseQuadratic, s"dense column must route quadratic: ${dense.probe}")
      val sparse = PrefixJoin.jaccardPairsAuto(
        df, "doc_id", "g_sparse", Seq("blk"), 0.35, snapshotKey = Some("spec:cols"))
      assert(!sparse.choseQuadratic,
        s"sparse column reused the dense column's cached decision: ${sparse.probe}")
    } finally PrefixJoin.clearRouteCache()
  }

  test("route cache is LRU-bounded; recently-touched decisions survive eviction") {
    // VERDICT r13 #5: entries are tiny but were never evicted — a
    // long-lived service iterating snapshots grew the map for the JVM
    // lifetime. The cap evicts least-recently-used; an evicted key just
    // re-probes on its next call (semantics unchanged — the decision is
    // a pure function of snapshot + params).
    PrefixJoin.clearRouteCache()
    try {
      val cap = PrefixJoin.RouteCacheMaxEntries
      (0 until cap).foreach(i => PrefixJoin.plantRouteForTest(s"spec:lru:$i"))
      assert(PrefixJoin.routeCacheSize == cap)
      // a real cached call touches its entry (access order), then the
      // overflow evicts the OLDEST untouched plant, never the live entry
      val first = PrefixJoin.jaccardPairsAuto(
        docsDf, "doc_id", "g", Seq("blk"), 0.35, snapshotKey = Some("spec:lru:live"))
      (0 until 200).foreach(i => PrefixJoin.plantRouteForTest(s"spec:lru:extra$i"))
      assert(PrefixJoin.routeCacheSize == cap,
        s"cache must stay bounded at $cap, got ${PrefixJoin.routeCacheSize}")
      val liveKey = spark.sparkContext.applicationId +
        "|spec:lru:live|id=doc_id|tok=g|t=0.35|r=0.5|q=20000000000|b=blk"
      assert(PrefixJoin.routeCachedForTest(liveKey),
        "the recently-inserted live decision must survive the planted flood")
      // and the cached entry still serves: same decision, zero re-probe
      val again = PrefixJoin.jaccardPairsAuto(
        docsDf, "doc_id", "g", Seq("blk"), 0.35, snapshotKey = Some("spec:lru:live"))
      assert(again.probe == first.probe && again.choseQuadratic == first.choseQuadratic)
    } finally PrefixJoin.clearRouteCache()
  }

  test("d4 dispatch reads parquet footers: zero Spark jobs at plan build") {
    // the size dispatch must come from footer metadata, not a count() —
    // the same de-eager contract rgpMine is pinned to in PangenomeSpec
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    // warm the source read first: a cold session's FIRST parquet read runs
    // one schema-inference job, which is the read's cost, not the
    // dispatcher's (same convention as PangenomeSpec's rgpMine assert)
    Tables.documents(spark, "/root/testdata/sf0.001").queryExecution.analyzed
    Thread.sleep(300)
    jobs = 0
    spark.sparkContext.addSparkListener(listener)
    try {
      val plan = SparkEntry.queries("d4_ngram_jaccard")(spark, "/root/testdata/sf0.001")
      plan.queryExecution.analyzed // build + analyze, no action
      Thread.sleep(500)            // let any async listener events drain
      assert(jobs == 0, s"building the d4 plan launched $jobs Spark jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the footer count is the exact cardinality count() would return
    assert(Tables.footerRowCount(spark, "/root/testdata/sf0.001", "documents") ==
      Tables.documents(spark, "/root/testdata/sf0.001").count())
  }
}

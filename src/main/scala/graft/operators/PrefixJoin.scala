package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity join via prefix filtering (the AllPairs / PPJoin
  * family — Bayardo, Ma, Srikant, WWW'07; Xiao et al., ICDE'08): under any
  * single global token order, two distinct-token sets with
  * Jaccard(x, y) >= t must share at least one token inside each other's
  * first |s| - ceil(t * |s|) + 1 tokens. Ordering tokens by ascending
  * document frequency makes those prefixes the RARE tokens, so a candidate
  * join on prefix tokens is near-linear where a blocked all-pairs join is
  * quadratic — and, unlike MinHash banding, the filter is LOSSLESS: the
  * verified output is identical to the exhaustive join's. This is the
  * 100 TB branch of d4-style exact n-gram dedup (reference shape:
  * RGPs.ipynb cell 70's all-pairs set similarity).
  *
  * Plan shape (no driver-side state, no cartesian): token explode →
  * df count (one shuffle) → per-doc re-sort (one shuffle) → prefix
  * explode → equi-join on (block, token) → distinct pair ids →
  * verify join back on ids. Every join is equi-keyed; skewed hot tokens
  * are exactly the ones frequency ordering keeps OUT of prefixes.
  */
object PrefixJoin {

  /** All pairs (id1 < id2) within the same `blockCols` block whose token
    * sets reach `threshold` Jaccard. `tokCol` must hold DISTINCT tokens
    * per row, ascending-sorted `array<bigint>` (as produced by
    * `array_sort(array_distinct(...))` — the verify stage runs the
    * codegen `sorted_intersect_size` two-pointer merge on it).
    * Output: blockCols ++ (id1, id2, jaccard).
    */
  def jaccardPairs(
      docs0: DataFrame, idCol: String, tokCol: String,
      blockCols: Seq[String], threshold: Double): DataFrame =
    jaccardPairs(docs0, idCol, tokCol, blockCols, threshold,
      positionalFilter = true)

  /** The df-ordered prefix frame both the candidate stage and the
    * density probe read: per doc, the first |s| - ceil(t*|s|) + 1 tokens
    * of the (df, tok)-sorted set, with each prefix token's 1-based
    * position (for the PPJoin positional filter). Ascending df puts the
    * rarest tokens first in every prefix. Input must carry
    * blockCols ++ (pj_id, pj_g); output: blockCols ++ (pj_id, sz, ptok, ppos).
    */
  private def orderedPrefixes(docs: DataFrame, bcols: Seq[org.apache.spark.sql.Column],
      threshold: Double): DataFrame = {
    // global document frequency per token — ascending df puts the rarest
    // tokens first in every prefix
    val toks = docs.select(
      (bcols :+ col("pj_id") :+ explode(col("pj_g")).as("tok")): _*)
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // per-doc tokens re-sorted by (df, tok) — a deterministic total order —
    // then cut to the Jaccard prefix |s| - ceil(t*|s|) + 1; posexplode
    // keeps each prefix token's 1-based POSITION in the df-ordered set.
    // ceil runs on sz·t MINUS the conservative 1e-9 slack (the positional
    // filter's discipline): when the rational t·|s| is an exact integer k
    // but the double product lands at k + 1 ulp, a slack-free ceil reads
    // k + 1 and cuts the prefix ONE TOKEN SHORT — a candidate the
    // exhaustive join finds never gets generated, and no downstream
    // verification can resurrect it (d4's t = 0.35 is safe, but the API
    // takes arbitrary thresholds; PrefixJoinSpec pins t = 0.07 with
    // |s| = 100, where 100·0.07 = 7.000000000000001 in doubles)
    toks.join(freq, "tok")
      .groupBy((bcols :+ col("pj_id")): _*)
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ts"))
      .withColumn("sz", size(col("ts")))
      .withColumn("plen",
        (col("sz") - ceil(col("sz") * lit(threshold) - lit(1e-9)) + 1).cast("int"))
      .select((bcols :+ col("pj_id") :+ col("sz") :+
        posexplode(expr("transform(slice(ts, 1, plen), x -> x.tok)"))
          .as(Seq("ppos0", "ptok"))): _*)
      .withColumn("ppos", col("ppos0") + 1)
      .drop("ppos0")
  }

  /** The exhaustive in-block pair scan — the other d4 regime: every
    * (id1 < id2) pair in a block streams through the codegen two-pointer
    * merge with NO candidate materialization, so there is nothing to
    * spill no matter how degenerate the vocabulary. The lossless
    * size-ratio filter (t·|x| ≤ |y| ≤ |x|/t, a necessary condition for
    * Jaccard ≥ t) prunes pairs before the merge. Output contract is
    * IDENTICAL to [[jaccardPairs]]: blockCols ++ (id1, id2, jaccard).
    */
  def quadraticPairs(
      docs0: DataFrame, idCol: String, tokCol: String,
      blockCols: Seq[String], threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]: $threshold")
    graft.functions.GraftExtensions.registerInto(docs0.sparkSession)
    val bcols = blockCols.map(col)
    val a = docs0.select(
      (bcols :+ col(idCol).as("id1") :+ col(tokCol).as("g1")): _*)
    val b = docs0.select(
      (blockCols.map(c => col(c).as(s"${c}_r")) :+ col(idCol).as("id2")
        :+ col(tokCol).as("g2")): _*)
    val blockEq = blockCols.map(c => col(c) === col(s"${c}_r"))
      .reduce(_ && _)
    // size-ratio pre-filter with the 1e-9 ceil slack: the rational
    // condition is |y| ≥ t·|x|, and a double product one ulp above an
    // exact integer would otherwise ceil too high and drop a true
    // boundary pair BEFORE the exact verification can see it
    a.join(b, blockEq && col("id1") < col("id2") &&
        size(col("g2")) >= ceil(size(col("g1")) * lit(threshold) - lit(1e-9)) &&
        size(col("g1")) >= ceil(size(col("g2")) * lit(threshold) - lit(1e-9)))
      .withColumn("inter", expr("sorted_intersect_size(g1, g2)"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("g1")) + size(col("g2")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select((bcols :+ col("id1") :+ col("id2") :+ col("jaccard")): _*)
  }

  /** Evidence behind an automatic prefix-vs-quadratic routing decision.
    * `prefixCandidates` = Σ over (block, prefix token) of c·(c−1)/2 —
    * the exact number of (id1 < id2, shared-prefix-token) row pairs the
    * candidate join MATCHES, with pairs sharing several prefix tokens
    * counted once per shared token, exactly as the join emits them.
    * The size-ratio and positional conditions evaluate on those matched
    * rows and prune some before the distinct's exchange, so this is an
    * UPPER bound on the shuffled volume — tight exactly in the dense
    * regime the router guards (r10 measured the positional filter as a
    * wash there: dense vocabularies leave the cap loose), and
    * conservatively safe in between (overestimating can only route a
    * borderline corpus to the spill-proof quadratic). `blockPairs` is
    * the exhaustive in-block comparison count (Σ over blocks of
    * n·(n−1)/2) the quadratic branch would stream.
    *
    * `exactPrefixCount = false` marks a probe the SPARSE pre-probe
    * short-circuited (r12): `prefixCandidates` then holds the all-token
    * candidate bound Σ over (block, token) of c·(c−1)/2 — a superset of
    * the prefix-token sum (each doc's prefix ⊆ its token set, so every
    * per-(block, token) prefix count ≤ the all-token count). When even
    * that bound sits below the dense threshold the corpus is decisively
    * open-vocabulary and the expensive df-join + per-doc-sort prefix
    * derivation never runs — the routing decision is identical, proven
    * by the bound's direction alone.
    */
  final case class DensityProbe(nDocs: Long, blockPairs: Long,
      prefixCandidates: Long, exactPrefixCount: Boolean = true) {
    /** Dense-vocabulary regime: the prefix "filter" would shuffle at
      * least `denseRatio` × the exhaustive comparison count — it is not
      * filtering, it is materializing (and spilling) the cross product.
      */
    def dense(denseRatio: Double): Boolean =
      prefixCandidates >= (denseRatio * blockPairs).toLong
  }

  /** Measure both regimes' costs with two SMALL aggregation jobs (token
    * volume each — linear, nothing pair-shaped) so the router commits to
    * a join only after seeing the evidence. The prefix branch later
    * re-derives the prefix frame (~one extra linear token pass): caching
    * it across probe and join would pin O(corpus tokens) of
    * executor memory for the query's lifetime — the wrong trade at
    * 100 TB, where the probe exists to AVOID a 230 GB shuffle spill.
    */
  // pair counts are c·(c−1)/2 summed over millions of groups — at
  // 100 TB that overflows long mid-sum, so the sum runs in decimal(38)
  // and saturates at Long.MaxValue on the way out (the router only
  // compares magnitudes; saturation can never flip dense to sparse)
  private def satLong(d: java.math.BigDecimal): Long =
    d.toBigInteger.min(java.math.BigInteger.valueOf(Long.MaxValue)).longValue

  private def pairSumCol = coalesce(
    sum(col("c").cast("decimal(38,0)") * (col("c") - 1) / 2),
    lit(java.math.BigDecimal.ZERO))

  /** nDocs + exhaustive in-block comparison count, from ONE aggregate
    * over the block counts — splitting it into separate collects would
    * re-run the corpus scan + block groupBy a second time for a number
    * the same pass already holds.
    */
  private def blockStats(docs: DataFrame,
      bcols: Seq[org.apache.spark.sql.Column]): (Long, Long) = {
    val bp = docs.groupBy(bcols: _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).cast("long"), pairSumCol)
      .collect()(0)
    (bp.getLong(0), satLong(bp.getDecimal(1)))
  }

  /** The exact prefix-candidate volume (one aggregate over the df-join +
    * per-doc-sort prefix derivation — the probe's expensive pass).
    */
  private def prefixCandidateCount(docs: DataFrame,
      bcols: Seq[org.apache.spark.sql.Column], threshold: Double): Long =
    satLong(
      orderedPrefixes(docs, bcols, threshold)
        .groupBy((bcols :+ col("ptok")): _*).agg(count(lit(1)).as("c"))
        .agg(pairSumCol).collect()(0).getDecimal(0))

  /** The all-token candidate bound: Σ over (block, token) of c·(c−1)/2,
    * with c the per-(block, token) document count over EVERY token (not
    * just prefix tokens). One linear explode + aggregate — no df join,
    * no per-doc re-sort, no prefix cut — and an upper bound on
    * [[prefixCandidateCount]] at any threshold, since each doc's prefix
    * is a subset of its token set. The r12 pre-probe reads this first:
    * when even the bound is decisively sparse, the expensive exact pass
    * never runs.
    */
  private def allTokenCandidateBound(docs: DataFrame,
      bcols: Seq[org.apache.spark.sql.Column]): Long =
    satLong(
      docs.select((bcols :+ explode(col("pj_g")).as("tok")): _*)
        .groupBy((bcols :+ col("tok")): _*).agg(count(lit(1)).as("c"))
        .agg(pairSumCol).collect()(0).getDecimal(0))

  def densityProbe(
      docs0: DataFrame, idCol: String, tokCol: String,
      blockCols: Seq[String], threshold: Double): DensityProbe = {
    val bcols = blockCols.map(col)
    val docs = docs0.select(
      (bcols :+ col(idCol).as("pj_id") :+ col(tokCol).as("pj_g")): _*)
    val (nDocs, blockPairs) = blockStats(docs, bcols)
    DensityProbe(nDocs, blockPairs,
      prefixCandidateCount(docs, bcols, threshold))
  }

  /** The routing decision [[jaccardPairsAuto]] took, returned alongside
    * the (lazy) pair frame so callers and specs can pin WHY a plan was
    * chosen without re-deriving the probe.
    */
  final case class AutoPairs(pairs: DataFrame, probe: DensityProbe,
      choseQuadratic: Boolean)

  /** Vocabulary-aware automatic dispatch between the two lossless d4
    * regimes. The r10 scaling study (SCALING.md) measured the failure
    * this guards: on a dense-vocabulary corpus (~37³ trigrams, every
    * prefix token common) the prefix candidate stage approached the
    * in-block cross product × shared-prefix width and spilled > 230 GB
    * at 150k docs — twice — while the quadratic scan finished the same
    * corpus in 163.7 s with zero spill. Routing on corpus SIZE cannot
    * see this; only the df table can, and the probe reads it before any
    * join is committed. Both branches produce identical verified rows
    * (PrefixJoinSpec pins bit-identity), so the router never changes the
    * answer — only the plan.
    *
    * `denseRatio`: prefix-candidate volume ≥ this fraction of the
    * exhaustive comparison count ⇒ dense regime (default 0.5 — at that
    * point the "filter" shuffles half the cross product AND still pays
    * the distinct + verify joins, while the quadratic streams with zero
    * materialization; set it absurdly high to force the prefix branch).
    * `maxQuadraticPairs`: fail-fast ceiling on the dense regime's
    * comparison count — beyond it NEITHER exact branch is sane and the
    * error names the designed fallback (d2 MinHash-LSH banding, which
    * never materializes pair candidates at all). `ceilingHint`: extra
    * remediation text appended to that error — the message itself is
    * worded on the maxQuadraticPairs PARAMETER (this API is generic);
    * a caller whose ceiling is conf-backed (d4) passes its conf key
    * here so its users get advice that actually affects their call.
    *
    * Probe cost (r12): routing starts with the cheap all-token
    * candidate bound ([[allTokenCandidateBound]] — one explode +
    * aggregate); only when the bound cannot prove the corpus sparse
    * does the exact prefix-candidate pass run. Open-vocabulary corpora
    * — the common case — pay two cheap linear aggregates and never
    * build the probe's df-ordered prefix frame at all.
    */
  /** Routing decisions cached per immutable snapshot (r13, the r11/r12
    * probe-cost follow-up): above its size threshold every d4 plan BUILD
    * — including plan-only consumers (explain, audits) and repeated
    * builds of the same query (bench reps) — re-ran the probe's scouting
    * aggregates against the corpus. A caller that can prove its input
    * snapshot immutable passes `snapshotKey`; the (probe, route) DECISION
    * (a few longs — never data) is then derived once per (application,
    * snapshot, routing params) and reused, so repeated builds over the
    * same snapshot run zero probe jobs. The pair frames themselves are
    * rebuilt per call (lazy, job-free). A throwing decision (the
    * quadratic ceiling) records no entry and rethrows on every call.
    */
  /** Bounded LRU (access-order LinkedHashMap): entries are a few longs
    * each, but a long-lived service iterating over many snapshots would
    * otherwise grow the map for the JVM lifetime — the cap evicts the
    * least-recently-used decision, which simply re-probes if asked again.
    */
  private[graft] val RouteCacheMaxEntries = 1024
  private val routeCache =
    new java.util.LinkedHashMap[String, (DensityProbe, Boolean)](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (DensityProbe, Boolean)]): Boolean =
        size() > RouteCacheMaxEntries
    }

  /** Test hook: forget cached routing decisions (specs that pin the
    * probe's job behavior need a cold cache regardless of suite order).
    */
  private[graft] def clearRouteCache(): Unit =
    routeCache.synchronized(routeCache.clear())

  private[graft] def routeCacheSize: Int =
    routeCache.synchronized(routeCache.size())

  /** Test hooks for the LRU bound: plant a synthetic decision / ask
    * whether a key is still resident (specs can't afford 1000+ real
    * probe runs just to watch the eviction fire).
    */
  private[graft] def plantRouteForTest(key: String): Unit =
    routeCache.synchronized(
      routeCache.put(key, (DensityProbe(0L, 0L, 0L), false)): Unit)

  private[graft] def routeCachedForTest(key: String): Boolean =
    routeCache.synchronized(routeCache.containsKey(key))

  def jaccardPairsAuto(
      docs0: DataFrame, idCol: String, tokCol: String,
      blockCols: Seq[String], threshold: Double,
      denseRatio: Double = 0.5,
      maxQuadraticPairs: Long = 20000000000L,
      ceilingHint: String = "",
      snapshotKey: Option[String] = None): AutoPairs = {
    require(denseRatio > 0.0, s"denseRatio must be positive: $denseRatio")
    require(maxQuadraticPairs > 0, s"maxQuadraticPairs must be positive: $maxQuadraticPairs")
    val bcols = blockCols.map(col)
    val docs = docs0.select(
      (bcols :+ col(idCol).as("pj_id") :+ col(tokCol).as("pj_g")): _*)
    def decide(): (DensityProbe, Boolean) = {
      val (nDocs, blockPairs) = blockStats(docs, bcols)
      // SPARSE pre-probe (r12): the all-token candidate bound costs one
      // cheap explode + aggregate; when even that superset of the prefix
      // candidate volume is below the dense threshold, the corpus is
      // decisively open-vocabulary and the df-join + per-doc-sort exact
      // pass (the probe's expensive half, ~one extra linear token pass at
      // 150k docs) is skipped outright. The bound can only OVERestimate
      // density, so skipping on its say-so can never misroute a dense
      // corpus to the prefix branch.
      val bound = allTokenCandidateBound(docs, bcols)
      val pre = DensityProbe(nDocs, blockPairs, bound, exactPrefixCount = false)
      if (!pre.dense(denseRatio)) (pre, false)
      else {
        val probe = DensityProbe(nDocs, blockPairs,
          prefixCandidateCount(docs, bcols, threshold))
        if (probe.dense(denseRatio)) {
          if (probe.blockPairs > maxQuadraticPairs) {
            // remediation is worded on the PARAMETER — this API is generic;
            // callers with a conf-backed ceiling (d4) append their own
            // conf-key hint via `ceilingHint`
            val hint = if (ceilingHint.isEmpty) "" else s", or $ceilingHint"
            throw new IllegalStateException(
              s"dense-vocabulary corpus: the prefix index would shuffle " +
                s"${probe.prefixCandidates} candidate rows against " +
                s"${probe.blockPairs} exhaustive in-block pairs (ratio ≥ " +
                s"$denseRatio), and the exhaustive scan itself exceeds the " +
                s"$maxQuadraticPairs-pair ceiling (the maxQuadraticPairs " +
                "parameter) — neither exact branch is viable at this scale; " +
                "use d2_minhash_lsh (MinHash-LSH banding) for near-dup " +
                "detection on this corpus, or raise maxQuadraticPairs if " +
                s"the cluster can absorb the scan$hint")
          }
          (probe, true)
        } else (probe, false)
      }
    }
    val (probe, choseQuadratic) = snapshotKey match {
      case Some(k) =>
        // applicationId scopes the cache to one JVM/app lifetime (the
        // SharedFrame convention); ALL data-shaping params are part of
        // the key — id/token columns included (two calls over the same
        // snapshot but different token columns probe different data) —
        // so a param change re-probes rather than reusing a decision it
        // didn't make
        val full = docs0.sparkSession.sparkContext.applicationId +
          s"|$k|id=$idCol|tok=$tokCol|t=$threshold|r=$denseRatio" +
          s"|q=$maxQuadraticPairs|b=${blockCols.mkString(",")}"
        // decide() runs Spark jobs — keep it outside the lock so two
        // concurrent first-builds never serialize behind each other;
        // the decision is deterministic per key, so a racing duplicate
        // probe is wasted work at worst, never a wrong answer (first
        // writer wins, both writes are equal)
        Option(routeCache.synchronized(routeCache.get(full))).getOrElse {
          val d = decide()
          routeCache.synchronized {
            Option(routeCache.get(full)).getOrElse { routeCache.put(full, d); d }
          }
        }
      case None => decide()
    }
    AutoPairs(
      if (choseQuadratic)
        quadraticPairs(docs0, idCol, tokCol, blockCols, threshold)
      else jaccardPairs(docs0, idCol, tokCol, blockCols, threshold),
      probe, choseQuadratic)
  }

  /** `positionalFilter = false` exists ONLY for measurement (the
    * ScalingSlopes d4stats candidate-volume probe): both settings are
    * lossless and produce identical verified output; the flag controls
    * whether the ICDE'08 positional filter prunes the candidate stage.
    * Production callers always leave it on.
    */
  private[graft] def jaccardPairs(
      docs0: DataFrame, idCol: String, tokCol: String,
      blockCols: Seq[String], threshold: Double,
      positionalFilter: Boolean): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]: $threshold")
    graft.functions.GraftExtensions.registerInto(docs0.sparkSession)
    val bcols = blockCols.map(col)
    val docs = docs0.select(
      (bcols :+ col(idCol).as("pj_id") :+ col(tokCol).as("pj_g")): _*)
    val ordered = orderedPrefixes(docs, bcols, threshold)

    // candidate generation: same block, shared prefix token, the
    // (lossless) size-ratio filter t*|x| <= |y| <= |x|/t, AND PPJoin's
    // positional filter (Xiao et al., ICDE'08 §3.2): a shared token at
    // df-order positions (p1, p2) caps the achievable overlap at
    // 1 + min(sz1 - p1, sz2 - p2), and Jaccard >= t needs overlap
    // >= t/(1+t)·(sz1+sz2) — prune the pair's row when the cap can't
    // reach it. On dense-vocabulary/low-threshold corpora the prefix
    // retains most tokens and candidate volume otherwise approaches the
    // in-block cross product (measured: the 150k-doc synthetic corpus
    // at t=0.35 spilled >200 GB in the pre-distinct shuffle without
    // this filter). The 1e-9 slack keeps the float comparison strictly
    // conservative — a boundary pair passes to verification, which is
    // exact, so losslessness is structural (PrefixJoinSpec pins
    // bit-identity against the exhaustive join).
    val a = ordered.select(
      (bcols :+ col("pj_id").as("id1") :+ col("sz").as("sz1") :+
        col("ppos").as("p1") :+ col("ptok")): _*)
    val b = ordered.select(
      (blockCols.map(c => col(c).as(s"${c}_r")) :+ col("pj_id").as("id2")
        :+ col("sz").as("sz2") :+ col("ppos").as("p2") :+
        col("ptok").as("ptok_r")): _*)
    val blockEq = blockCols.map(c => col(c) === col(s"${c}_r"))
      .foldLeft(col("ptok") === col("ptok_r"))(_ && _)
    val overlapCap = lit(1) + least(col("sz1") - col("p1"), col("sz2") - col("p2"))
    val sizeCond = col("id1") < col("id2") &&
      // same 1e-9 ceil slack as quadraticPairs/orderedPrefixes: the
      // pre-filter must never drop a pair the exact verification would keep
      col("sz2") >= ceil(col("sz1") * lit(threshold) - lit(1e-9)) &&
      col("sz1") >= ceil(col("sz2") * lit(threshold) - lit(1e-9))
    val joinCond =
      if (positionalFilter)
        sizeCond && overlapCap.cast("double") * lit(1.0 + threshold) >=
          lit(threshold) * (col("sz1") + col("sz2")).cast("double") - lit(1e-9)
      else sizeCond
    val cands = a.join(b, blockEq && joinCond)
      .select((bcols :+ col("id1") :+ col("id2")): _*)
      .distinct()

    // exact verification on the original value-sorted arrays (`idCol` must
    // be globally unique, so block equality is implied by the id join)
    val verif = docs.select(col("pj_id"), col("pj_g"))
    cands
      .join(verif.select(col("pj_id").as("id1"), col("pj_g").as("g1")), Seq("id1"))
      .join(verif.select(col("pj_id").as("id2"), col("pj_g").as("g2")), Seq("id2"))
      .withColumn("inter", expr("sorted_intersect_size(g1, g2)"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("g1")) + size(col("g2")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select((bcols :+ col("id1") :+ col("id2") :+ col("jaccard")): _*)
  }
}

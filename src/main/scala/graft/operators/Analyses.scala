package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Exact._

/** SURVEY §3 flagship analyses as driver-contract queries.
  *
  * The domain pipeline's two composite plans — the genome track
  * (GIsInStrain.ipynb cells 3-8) and the RGP miner (RGPs.ipynb cell 8) —
  * are golden-tested on the mini-pangenome fixture in PangenomeSpec, but
  * those goldens can't be DuckDB-hash-checked. These two entries compose
  * the *same plan shapes* over the events table (strain → user_id, cluster
  * → event_type, GC → value, genome order → (ts, event_id)) so the
  * hardest composite plans get an oracle row too.
  *
  * Scale posture (same as the domain originals): per-user stats and
  * per-type counts are tiny aggregates broadcast back onto the fact
  * table; the positional model shuffles once on user_id and every window/
  * span step after that is partition-local. The distinct-user scalar is a
  * broadcast single-row join, never a driver-side count (the de-eager
  * contract — building these plans runs zero Spark jobs).
  */
object Analyses {

  private def wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  /** The positional frame every x2/x3 consumer reads: ONE window pass over
    * events computes both the genome-order index (`pos`) and the lag edge
    * (`prev`) — same partition key, same ordering, so Catalyst fuses them
    * into a single Window operator above a single exchange+sort.
    *
    * Spark does not deduplicate identical subplans inside one query, so
    * without sharing, the edge derivation, the two span sides, and the
    * span body would each re-run the events scan+shuffle+sort (~3× the
    * whole query cost at scale). The frame is persisted LAZILY: plan
    * construction still runs zero Spark jobs (the de-eager contract), the
    * first action populates the cache once, and Spark's CacheManager
    * dedupes by canonicalized plan, so repeated builds and x2/x3 share one
    * entry instead of stacking copies. MEMORY_AND_DISK: an evicted block
    * degrades to recompute, never OOM. (One-shot 100 TB ETL would
    * checkpoint this boundary to scratch parquet instead — see
    * [[graft.operators.Scratch]] — but these are interactive analysis
    * entries where the session-cache form is the idiomatic one.)
    */
  private def positioned(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    Positional.frame(s, d) // shared with the g6-g10 span family

  /** The RGP anchor-span pipeline shared by x2 and x3: anchor selection
    * (directed edge majority + core membership via broadcast scalar) and
    * the positional span join over the shared [[positioned]] frame `p`.
    * Returns (user_id, c1, c2, pos1, pos2).
    */
  private def anchorSpans(p: org.apache.spark.sql.DataFrame, d: String)
      : org.apache.spark.sql.DataFrame = {
    val coreFrac = 0.95; val majorityFrac = 0.15
    val minGap = 3; val maxGap = 6

    // directed cluster-level edges from consecutive events (G1/G2)
    val edges = p
      .filter(col("prev").isNotNull)
      .select(col("prev").as("c1"), col("event_type").as("c2"))
    val dir = edges.groupBy(col("c1"), col("c2")).agg(count(lit(1)).as("w"))
    val bothDirs = dir.unionByName(
      dir.select(col("c2").as("c1"), col("c1").as("c2"), col("w")))
    val nbOut = dir.groupBy(col("c1")).agg(sum(col("w")).as("nb_out"))

    // core filter: types present in > coreFrac of strains; the strain
    // count is a broadcast single-row scalar, not a driver action
    val nUsers = p.agg(countDistinct(col("user_id")).as("n_users"))
    val core = p.groupBy(col("event_type").as("ct"))
      .agg(countDistinct(col("user_id")).as("ng"))
      .crossJoin(broadcast(nUsers))
      .filter(col("ng") > col("n_users") * coreFrac)
      .select(col("ct"))

    val anchorPairs = bothDirs
      .join(nbOut, Seq("c1"))
      .filter(col("c1") =!= col("c2") && col("w") > col("nb_out") * majorityFrac)
      .join(core.withColumnRenamed("ct", "c1"), Seq("c1"), "left_semi")
      .join(core.withColumnRenamed("ct", "c2"), Seq("c2"), "left_semi")
      .select(col("c1"), col("c2")).distinct()

    // positional span join between anchor occurrences (G7)
    val f1 = p.select(col("user_id"), col("event_type").as("c1"),
      col("pos").as("pos1"))
    val f2 = p.select(col("user_id").as("uid2"), col("event_type").as("c2b"),
      col("pos").as("pos2"))
    SharedFrame(
      broadcast(anchorPairs)
        .join(f1, Seq("c1"))
        .join(f2, col("user_id") === col("uid2") && col("c2b") === col("c2") &&
          (col("pos2") - col("pos1")).between(minGap, maxGap))
        .select(col("user_id"), col("c1"), col("c2"), col("pos1"), col("pos2")),
      // tiny output (spans ≪ events), expensive lineage (edge majority +
      // core + positional join): share so x2's span-body join and x3's
      // strain-set derivation run ONE span pipeline — same contract as
      // [[positioned]] (zero jobs at build in persist mode, CacheManager
      // dedupes across queries and reps; scratch mode per SharedFrame)
      "anchor_spans", d)
  }

  /** SQL form of [[anchorSpans]] (CTE chain shared by the x2/x3 oracles). */
  private val anchorSpansSql =
    """ord AS (
      |  SELECT user_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |dir AS (
      |  SELECT prev AS c1, event_type AS c2, count(*) AS w
      |  FROM ord WHERE prev IS NOT NULL GROUP BY 1, 2),
      |both_dirs AS (
      |  SELECT c1, c2, w FROM dir
      |  UNION ALL SELECT c2 AS c1, c1 AS c2, w FROM dir),
      |nb_out AS (SELECT c1, sum(w) AS nb_out FROM dir GROUP BY 1),
      |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
      |core AS (
      |  SELECT event_type AS ct FROM events, nu
      |  GROUP BY event_type, n_users
      |  HAVING count(DISTINCT user_id) > n_users * 0.95),
      |anchor_pairs AS (
      |  SELECT DISTINCT b.c1, b.c2
      |  FROM both_dirs b JOIN nb_out n ON b.c1 = n.c1
      |  WHERE b.c1 <> b.c2 AND b.w > n.nb_out * 0.15
      |    AND b.c1 IN (SELECT ct FROM core)
      |    AND b.c2 IN (SELECT ct FROM core)),
      |spans AS (
      |  SELECT f1.user_id, a.c1, a.c2, f1.pos AS pos1, f2.pos AS pos2
      |  FROM anchor_pairs a
      |  JOIN ord f1 ON f1.event_type = a.c1
      |  JOIN ord f2 ON f2.user_id = f1.user_id AND f2.event_type = a.c2
      |    AND f2.pos - f1.pos BETWEEN 3 AND 6)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- Genome track: join -> position -> z-scores -> rolling flags ----
    // One plan: per-strain stats (A1) + per-cluster presence + position
    // (W5) + z/deviation (P11/P12) + smoothing and island/rare flags
    // (W1-W3) — GIsInStrain.ipynb cells 3-8 end-to-end.
    QueryDef(
      "x1_genome_track",
      (s, d) => {
        // every branch (stats, type counts, the tracked fact stream)
        // reads the shared positional cache; `pos` replaces the
        // re-derived row_number (identical rank, same window spec)
        val ev = positioned(s, d)
        val stats = ev.groupBy(col("user_id").as("uid"))
          .agg(eavg(col("value")).as("mu"), estddev(col("value")).as("sd"))
        val typeOcc = ev.groupBy(col("event_type").as("et"))
          .agg(count(lit(1)).as("n_occ"))
        // stats is keyed per user (strain analogue): bounded in the domain
        // (hundreds) but it SCALES with the corpus in the general case, so
        // no forced broadcast (the d9b/j3 lesson) — AQE broadcasts it from
        // observed size at small scale; beyond that the join shuffles on
        // user_id, which the window below reuses. typeOcc is a bounded
        // domain (event types) and keeps its hint.
        val tracked = ev
          .join(stats, col("user_id") === col("uid"))
          .join(broadcast(typeOcc), col("event_type") === col("et"))
          .withColumn("position", col("pos"))
          .withColumn("z", (col("value") - col("mu")) / col("sd"))
          .withColumn("deviating", (abs(col("z")) >= 1.5).cast("int"))
        val wp = Window.partitionBy(col("user_id")).orderBy(col("position"))
        val w10 = wp.rowsBetween(-9, 0)
        val w20 = wp.rowsBetween(-19, 0)
        val w5 = wp.rowsBetween(-4, 0)
        tracked
          // quantized windowed mean: window accumulation order differs per
          // engine; integer sums are order-free (same trick as W1)
          .withColumn("smooth_z",
            sum(floor(col("z") * lit(1e6) + lit(0.5)).cast("long")).over(w10)
              .cast("double") / lit(1e6) / count(col("z")).over(w10))
          .withColumn("gi_flag", (sum(col("deviating")).over(w20) > 5).cast("int"))
          .withColumn("rare_flag", (max(col("n_occ")).over(w5) <= 1990).cast("int"))
          .select(col("user_id"), col("position"), col("event_type"), col("value"),
            col("z"), col("deviating"), col("smooth_z"), col("gi_flag"),
            col("rare_flag"))
          .orderBy(col("user_id"), col("position"))
      },
      Some(s"""WITH stats AS (
              |  SELECT user_id AS uid, ${sqlAvg("value")} AS mu,
              |         ${sqlStddev("value")} AS sd
              |  FROM events GROUP BY user_id),
              |tp AS (SELECT event_type AS et, count(*) AS n_occ FROM events GROUP BY 1),
              |p AS (
              |  SELECT e.user_id, e.event_type, e.value, tp.n_occ,
              |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id)
              |      AS position,
              |    (e.value - s.mu) / s.sd AS z
              |  FROM events e
              |  JOIN stats s ON e.user_id = s.uid
              |  JOIN tp ON e.event_type = tp.et)
              |SELECT user_id, position, event_type, value, z,
              |  CAST(abs(z) >= 1.5 AS INT) AS deviating,
              |  CAST(sum(CAST(floor(z * 1e6 + 0.5) AS BIGINT)) OVER w10 AS DOUBLE)
              |    / 1e6 / count(z) OVER w10 AS smooth_z,
              |  CAST(sum(CAST(abs(z) >= 1.5 AS INT)) OVER w20 > 5 AS INT) AS gi_flag,
              |  CAST(max(n_occ) OVER w5 <= 1990 AS INT) AS rare_flag
              |FROM p
              |WINDOW
              |  w10 AS (PARTITION BY user_id ORDER BY position
              |          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
              |  w20 AS (PARTITION BY user_id ORDER BY position
              |          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
              |  w5 AS (PARTITION BY user_id ORDER BY position
              |         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
              |ORDER BY user_id, position""".stripMargin),
      doc = "SURVEY §3 lifecycle 1 (Pangenome.genomeTrack); GIsInStrain.ipynb cells 3-8"),

    // ---- RGP miner: anchors -> spans -> projections -> Welch t ----
    // Anchor selection (G4+G5 + core via broadcast scalar), positional
    // span join (G7), ordered collect + list projections + mobile
    // predicate (G8-G10), Welch t vs the strain background (A17) —
    // RGPs.ipynb cell 8 + cell 19 as one oracle-checked plan.
    QueryDef(
      "x2_rgp_mine",
      (s, d) => {
        val p = positioned(s, d)
        val spans = anchorSpans(p, d)

        // Span bodies via the ordered-array walk model (g8/g9's re-plan,
        // shared frame): each span's intervening rows are a map-side
        // `slice` of the per-user pos-ordered arrays instead of a
        // spans×width theta-join fan-out (~1M rows on the round-7
        // testdata) plus a regroup shuffle. Positions are dense
        // row_numbers, so every span (pos2-pos1 ≥ 3) has ≥ 2 intervening
        // rows — the inner-join group always exists, and the slice order
        // IS the (bpos, btype) sort the grouped form paid array_sort for.
        // The quantized mean/stddev replicate eavg/estddev element-wise
        // (identical division order, g9's proof pattern); long
        // accumulators are exact here because the slice sums are bounded
        // by width·(v·1e4)² ≪ 2^63 — an unbounded-width caller would use
        // the grouped decimal path instead.
        val width = col("pos2") - col("pos1") - lit(1)
        val sliceT = slice(col("seqT"), col("pos1") + 1, width)
        val sliceV = filter(slice(col("seqV"), col("pos1") + 1, width),
          v => v.isNotNull)
        val nV = size(sliceV)
        // nV = 0 (all-null values in the span) must yield null like
        // eavg's null-sum, not an ANSI DIVIDE_BY_ZERO (the rgpMine
        // zero-variance lesson)
        val m1 = when(nV === 0, lit(null).cast("double"))
          .otherwise(aggregate(sliceV, lit(0L),
            (acc, v) => acc + floor(v * lit(1e6) + lit(0.5)).cast("long"))
            .cast("double") / lit(1e6) / nV)
        val sV = aggregate(sliceV, lit(0L),
          (acc, v) => acc + floor(v * lit(1e4) + lit(0.5)).cast("long"))
          .cast("double") / lit(1e4)
        val s2V = aggregate(sliceV, lit(0L), (acc, v) => {
          val q = floor(v * lit(1e4) + lit(0.5)).cast("long"); acc + q * q
        }).cast("double") / lit(1e8)
        val nD = nV.cast("double")
        val sd1 = when(nV < 2, lit(null).cast("double"))
          .otherwise(sqrt(greatest((s2V - sV * sV / nD) / (nD - lit(1.0)),
            lit(0.0))))

        val bg = p.groupBy(col("user_id").as("su"))
          .agg(eavg(col("value")).as("mu0"), estddev(col("value")).as("sd0"))

        spans.join(Positional.userSeq(s, d), Seq("user_id"))
          .select(col("user_id"), col("c1"), col("c2"), col("pos1"), col("pos2"),
            width.as("insertion_nb_features"),
            element_at(col("seqT"), (col("pos1") + 1).cast("int"))
              .as("first_feature"),
            array_join(sliceT, ",").as("cluster_ids"),
            size(filter(sliceT, x => x === "error")).cast("long").as("n_trna"),
            exists(sliceT, x => x === "purchase").cast("int").as("has_mobile"),
            nV.cast("double").as("n1"),
            m1.as("m1"),
            sd1.as("sd1"))
          .filter(col("has_mobile") === 1) // requireMobile
          // per-user background moments: same no-forced-broadcast rule as
          // x1's stats (scales with users; AQE upgrades when small)
          .join(bg, col("user_id") === col("su")).drop("su")
          .withColumn("t_value",
            when(col("sd1").isNotNull,
              (col("m1") - col("mu0")) /
                sqrt(col("sd1") * col("sd1") / col("n1") +
                  col("sd0") * col("sd0") / lit(5000.0))))
          .select(col("user_id"), col("c1"), col("c2"), col("pos1"), col("pos2"),
            col("insertion_nb_features"), col("first_feature"), col("cluster_ids"),
            col("n_trna"), col("m1"), col("t_value"))
          .orderBy(col("user_id"), col("pos1"), col("pos2"), col("c1"), col("c2"))
      },
      Some(s"""WITH $anchorSpansSql,
              |bg AS (
              |  SELECT user_id AS su, ${sqlAvg("value")} AS mu0,
              |         ${sqlStddev("value")} AS sd0
              |  FROM events GROUP BY user_id),
              |grouped AS (
              |  SELECT s.user_id, s.c1, s.c2, s.pos1, s.pos2,
              |    s.pos2 - s.pos1 - 1 AS insertion_nb_features,
              |    min_by(b.event_type, b.pos) AS first_feature,
              |    string_agg(b.event_type, ',' ORDER BY b.pos) AS cluster_ids,
              |    CAST(sum(CASE WHEN b.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n_trna,
              |    max(CASE WHEN b.event_type = 'purchase' THEN 1 ELSE 0 END) AS has_mobile,
              |    CAST(count(b.value) AS DOUBLE) AS n1,
              |    ${sqlAvg("b.value")} AS m1,
              |    ${sqlStddev("b.value")} AS sd1
              |  FROM spans s JOIN ord b
              |    ON b.user_id = s.user_id AND b.pos > s.pos1 AND b.pos < s.pos2
              |  GROUP BY 1, 2, 3, 4, 5)
              |SELECT g.user_id, g.c1, g.c2, g.pos1, g.pos2,
              |  g.insertion_nb_features, g.first_feature, g.cluster_ids, g.n_trna,
              |  g.m1,
              |  CASE WHEN g.sd1 IS NOT NULL THEN
              |    (g.m1 - bg.mu0) /
              |      sqrt(g.sd1 * g.sd1 / g.n1 + bg.sd0 * bg.sd0 / 5000.0)
              |  END AS t_value
              |FROM grouped g JOIN bg ON g.user_id = bg.su
              |WHERE g.has_mobile = 1
              |ORDER BY g.user_id, g.pos1, g.pos2, g.c1, g.c2""".stripMargin),
      doc = "SURVEY §3 lifecycle 2 (Pangenome.rgpMine); RGPs.ipynb cells 8+19"),

    // ---- Anchor-group phylogenetic spread (RGPs.ipynb cells 44-67) ----
    // Per anchor pair: the strain set carrying that insertion, all strain
    // pairs (J14), a phylogenetic distance per pair (A12), min/mean/max +
    // counts (A7/A10) — Pangenome.anchorPhylo's composition, made
    // oracle-checkable by swapping the Newick tree for a DETERMINISTIC
    // synthetic phylogeny both engines can compute: strains are leaves of
    // a complete binary trie over user_id bits, so the patristic distance
    // is 2 × bit-length of (u1 XOR u2) (= 2 × height of the lowest common
    // subtree, unit branch lengths). The Newick/LCA path stays golden-
    // tested in PangenomeSpec; this pins the composition end-to-end.
    QueryDef(
      "x3_anchor_phylo",
      (s, d) => {
        // The pairwise aggregate NEVER materializes the O(n²) pair join:
        // under the bit-trie metric, the unordered pairs first differing
        // at bit k number Σ_prefix n0(prefix)·n1(prefix) and each has
        // distance 2(k+1) — so one explode to (user × bit level), one
        // count per (anchor, level, prefix), and an integer fold give the
        // identical n_pairs / min / mean / max the quadratic join would
        // (same longs, same single double division — oracle-hash-equal;
        // the DuckDB oracle stays the quadratic formulation). O(n·bits)
        // rows instead of O(n²): the difference between 10M and 600k rows
        // at sf0.1, and between a cluster job and an impossibility at
        // the reference's 770 strains × 5k anchors scale-up.
        val p = positioned(s, d)
        val strains = anchorSpans(p, d)
          .select(col("c1"), col("c2"), col("user_id")).distinct()
        // trie depth = bit length of the LARGEST id, as a broadcast scalar
        // over the (cached) positioned frame — levels past it have m = 0
        // by construction, so hardcoding 40 only wasted explode fan-out
        // (testdata ids are ~11 bits: 3.6x fewer leveled rows) and capped
        // the legal domain. conv(·,10,2) length is exact integer bit
        // arithmetic, never a log2 rounding hazard. Negative ids would
        // still silently undercount (they share no prefix with anything),
        // so that check stays fused into a used column and fails LOUDLY.
        val bits = p.agg(max(col("user_id")).as("mx"))
          .select(greatest(length(conv(col("mx"), 10, 2)), lit(1))
            .cast("int").as("nbits"))
        val leveled = strains
          .crossJoin(broadcast(bits))
          .select(col("c1"), col("c2"), col("user_id").as("u"),
            explode(sequence(lit(0), col("nbits") - 1)).as("k"))
          .select(col("c1"), col("c2"), col("k"),
            expr("CASE WHEN u >= 0 THEN u >> (k + 1) " +
              "ELSE CAST(raise_error('x3_anchor_phylo: negative user_id " +
              "breaks the bit-trie phylogeny') AS BIGINT) END")
              .as("prefix"),
            expr("(u >> k) & 1").as("bit"))
        // per level: m = pairs first differing at bit k; ns = Σ(n0+n1) is
        // the strain count at EVERY level, so it rides the same
        // aggregation instead of a second pass over the span pipeline
        val mk = leveled
          .groupBy(col("c1"), col("c2"), col("k"), col("prefix"))
          .agg(sum(lit(1) - col("bit")).as("n0"), sum(col("bit")).as("n1"))
          .groupBy(col("c1"), col("c2"), col("k"))
          .agg(sum(col("n0") * col("n1")).as("m"),
            sum(col("n0") + col("n1")).as("ns"))
        mk.groupBy(col("c1"), col("c2"))
          .agg(max(col("ns")).as("n_strains"),
            sum(col("m")).as("n_pairs"),
            (lit(2L) * (min(when(col("m") > 0, col("k"))) + 1)).as("min_dist"),
            (sum(col("m") * lit(2L) * (col("k") + 1)).cast("double") /
              sum(col("m"))).as("mean_dist"),
            (lit(2L) * (max(when(col("m") > 0, col("k"))) + 1)).as("max_dist"))
          .filter(col("n_pairs") > 0) // single-strain anchors have no pairs
          .select(col("c1"), col("c2"), col("n_strains"), col("n_pairs"),
            col("min_dist"), col("mean_dist"), col("max_dist"))
          .orderBy(col("c1"), col("c2"))
      },
      Some(s"""WITH $anchorSpansSql,
              |strains AS (SELECT DISTINCT c1, c2, user_id FROM spans),
              |ns AS (
              |  SELECT c1, c2, count(DISTINCT user_id) AS n_strains
              |  FROM strains GROUP BY 1, 2),
              |pairs AS (
              |  SELECT a.c1, a.c2, a.user_id AS u1, b.user_id AS u2,
              |    CASE WHEN xor(a.user_id, b.user_id) = 0 THEN 0
              |         ELSE 2 * length(bin(xor(a.user_id, b.user_id))) END AS dist
              |  FROM strains a JOIN strains b
              |    ON a.c1 = b.c1 AND a.c2 = b.c2 AND a.user_id < b.user_id),
              |agg AS (
              |  SELECT c1, c2, count(*) AS n_pairs,
              |    min(dist) AS min_dist,
              |    CAST(sum(dist) AS DOUBLE) / count(*) AS mean_dist,
              |    max(dist) AS max_dist
              |  FROM pairs GROUP BY 1, 2)
              |SELECT g.c1, g.c2, ns.n_strains, g.n_pairs,
              |  CAST(g.min_dist AS BIGINT) AS min_dist, g.mean_dist,
              |  CAST(g.max_dist AS BIGINT) AS max_dist
              |FROM agg g JOIN ns ON g.c1 = ns.c1 AND g.c2 = ns.c2
              |ORDER BY g.c1, g.c2""".stripMargin),
      doc = "SURVEY §3 lifecycle 3 (Pangenome.anchorPhylo); RGPs.ipynb cells 44-67"),

    // ---- Core-gene analysis (RGPs.ipynb cells 100-118, :3232-3405) ----
    // The reference's third-most-used analysis after the track and the
    // miner, composed as ONE oracle-checked plan: presence matrix (A13,
    // pandas featureCounts) -> per-feature nonzero-insertion counts (A14,
    // `colData.loc[colData != 0].size`) -> the `count > 0.95 * shape[0]`
    // core filter (A15) -> CLUSTER property lookup per core feature (J16,
    // getDescriptionCluster: description/number_genomes per cluster_id).
    // Scale shape: two shuffled aggregates over events (matrix + the
    // metadata dim), everything downstream is tiny and broadcast — the
    // per-type metadata join is the reference's per-feature Neo4j point
    // lookup turned into one broadcast hash join instead of |core| round
    // trips.
    QueryDef(
      "x4_core_genes",
      (s, d) => {
        val ev = T.events(s, d)
        // A13: long-form presence/count matrix (user x type)
        val matrix = ev.groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        // A14: in how many insertions (users) does each feature appear
        val nz = matrix.filter(col("cnt") =!= 0)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n_ins"))
        // matrix height as a broadcast scalar, never a driver action
        val nRows = ev.agg(countDistinct(col("user_id")).as("n_rows"))
        // A15: core features = present in > 95% of the matrix rows
        val core = nz.crossJoin(broadcast(nRows))
          .filter(col("n_ins") > col("n_rows") * 0.95)
          .select(col("event_type"), col("n_ins"))
        // J16: the CLUSTER-node property lookup (description/number_genomes
        // analogue: per-type occurrence count + exact mean value)
        val meta = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("number_genomes"),
            eavg(col("value")).as("mean_value"))
        core.join(meta, Seq("event_type"))
          .select(col("event_type"), col("n_ins"), col("number_genomes"),
            col("mean_value"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH matrix AS (
              |  SELECT user_id, event_type, count(*) AS cnt
              |  FROM events GROUP BY 1, 2),
              |nz AS (
              |  SELECT event_type, count(*) AS n_ins
              |  FROM matrix WHERE cnt != 0 GROUP BY 1),
              |nu AS (SELECT count(DISTINCT user_id) AS n_rows FROM events),
              |core AS (
              |  SELECT event_type, n_ins FROM nz, nu
              |  WHERE n_ins > n_rows * 0.95),
              |meta AS (
              |  SELECT event_type, count(*) AS number_genomes,
              |    ${sqlAvg("value")} AS mean_value
              |  FROM events GROUP BY 1)
              |SELECT c.event_type, c.n_ins, m.number_genomes, m.mean_value
              |FROM core c JOIN meta m ON c.event_type = m.event_type
              |ORDER BY c.event_type""".stripMargin),
      doc = "SURVEY §3 core-gene analysis; RGPs.ipynb:3232-3405 cells 100-118"),

    // ---- Feature/strain metrics enrichment (extendingDB_FeatureAnd
    // StrainMetrics.py:21-75) ---- the reference's 4th entry point as ONE
    // oracle row: variation decode (variationToFullSequence) → GC per
    // feature (:52) → per-strain mean/stddev → z-score + deviating upsert.
    // The Spark side takes the LONG way — encode the sequence against a
    // derived reference, decode it back (the P7/P8 codec, codegen
    // expressions), GC the decoded sequence — while the oracle computes GC
    // on the raw sequence directly: hash equality proves the codec path is
    // lossless IN the composite and the stat math matches, not just in
    // isolated unit tests. Scale shape: one scan, codec + GC inside one
    // codegen span, per-strain stats broadcast back — zero extra shuffles
    // beyond the one tiny aggregate.
    QueryDef(
      "x5_feature_metrics",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val feats = T.documents(s, d)
          .withColumn("seq", substring(col("text"), 1, 80))
          .withColumn("ref", translate(col("seq"), "aeiou", "eioua"))
          .withColumn("full_seq",
            expr("variation_decode(variation_encode_native(seq, ref), ref)"))
          .select(col("doc_id"), col("lang"),
            expr("gc_content_native(full_seq)").as("gc"))
        val stats = feats.groupBy(col("lang").as("lg"))
          .agg(eavg(col("gc")).as("mu"), estddev(col("gc")).as("sd"))
        feats.join(broadcast(stats), col("lang") === col("lg")).drop("lg")
          .withColumn("z", (col("gc") - col("mu")) / col("sd"))
          .withColumn("deviating", (abs(col("z")) >= 1.5).cast("int"))
          .select(col("doc_id"), col("lang"), col("gc"), col("z"),
            col("deviating"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH f AS (
              |  SELECT doc_id, lang,
              |    CASE WHEN length(substring(text, 1, 80)) = 0 THEN 0.0
              |         ELSE length(regexp_replace(upper(substring(text, 1, 80)),
              |                '[^GCS]', '', 'g')) * 100.0
              |              / length(substring(text, 1, 80)) END AS gc
              |  FROM documents),
              |st AS (
              |  SELECT lang AS lg, ${sqlAvg("gc")} AS mu, ${sqlStddev("gc")} AS sd
              |  FROM f GROUP BY 1)
              |SELECT f.doc_id, f.lang, f.gc,
              |  (f.gc - st.mu) / st.sd AS z,
              |  CAST(abs((f.gc - st.mu) / st.sd) >= 1.5 AS INT) AS deviating
              |FROM f JOIN st ON f.lang = st.lg
              |ORDER BY f.doc_id""".stripMargin),
      doc = "SURVEY §3 enrichment lifecycle; extendingDB_FeatureAndStrainMetrics.py:21-75")
  )
}

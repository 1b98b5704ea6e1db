package graft.operators

import graft.{QueryDef, Tables => T}
import graft.functions.{GraftFunctions, Newick}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Exact._

/** SURVEY §2's domain-specific surface: the variation codec (P7/P8), CAI
  * (P10), deviation flags (P11), phylo tree distance (A12), Welch test with
  * p-value (A17), and the similarity/clustering pack (C1-C3).
  *
  * Where the computation is not SQL-expressible the oracle is either a
  * *self-checking invariant* (round-trip identity ⇒ constant expected
  * output) or a hand-computed golden table — both run distributed on the
  * executors, so the check still exercises the real 100 TB code path.
  */
object DomainOps {

  /** Deterministic DNA derived from document text (test carrier for the
    * genomic functions: every letter mapped onto A/C/G/T cyclically).
    */
  private def dnaOf(c: org.apache.spark.sql.Column) =
    translate(regexp_replace(upper(c), "[^A-Z]", ""),
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "ACGTACGTACGTACGTACGTACGTAC")

  /** Fixed phylogeny over the five event types (A12 test tree);
    * pairwise distances hand-verified in FunctionsSpec and the oracle.
    */
  val TestTree = "((click:1,view:2):1,(purchase:3,signup:1):2,error:5);"

  /** C1/C2 carrier sets, bitset-encoded: (user_id, mask: array<4×long>,
    * sz: popcount). Token indices come from a global row_number over the
    * distinct vocabulary — a deliberate single-partition window over a
    * handful of rows, broadcast back onto the fact table. The assert_true
    * filter guards the 256-bit capacity (vocab growth fails loudly, never
    * silently drops bits); it lives in a filter so column pruning cannot
    * remove it.
    */
  private def bitsetUserSets(s: org.apache.spark.sql.SparkSession, d: String) = {
    val toks = T.events(s, d).select(col("user_id"),
        concat(col("event_type"), lit("#"),
          floor(col("value") / 20).cast("long")).as("tok"))
      .distinct()
    val vocab = toks.select(col("tok")).distinct()
      .withColumn("idx", row_number().over(Window.orderBy(col("tok"))) - 1)
    toks.join(broadcast(vocab), "tok")
      .filter(expr("assert_true(idx < 256, 'c1/c2 bitset: vocab > 256 tokens')").isNull)
      .withColumn("word", (col("idx") / 64).cast("int"))
      .withColumn("bit", expr("shiftleft(CAST(1 AS BIGINT), idx % 64)"))
      .groupBy(col("user_id"), col("word"))
      .agg(expr("bit_or(bit)").as("wmask"))
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("word"), col("wmask"))).as("wm"))
      .withColumn("mask", expr(
        "transform(sequence(0, 3), w -> coalesce(" +
          "aggregate(filter(wm, e -> e.word = w), CAST(0 AS BIGINT), (a, e) -> a | e.wmask)," +
          " CAST(0 AS BIGINT)))"))
      .withColumn("sz", expr(
        "aggregate(transform(mask, x -> bit_count(x)), 0, (a, x) -> a + x)"))
      .select(col("user_id"), col("mask"), col("sz"))
      // both sides of the C1/C2 pair join read this frame: the trailing
      // repartition gives them an IDENTICAL exchange subplan, so
      // ReuseExchange materializes the set build once instead of twice
      // (same trick as d4's block-key repartition). The SharedFrame on
      // top lets c1 and c2 (and bench reps) share ONE set build — tiny
      // frame (|users| × 4 longs), same cache contract as Analyses'
      // positional frame (zero jobs at build in persist mode).
      .repartition(col("user_id"))
  }

  private def bitsetUserSetsShared(s: org.apache.spark.sql.SparkSession, d: String) =
    SharedFrame(bitsetUserSets(s, d), "bitset_user_sets", d)

  /** Σ bit_count(m1[w] & m2[w]) — the bitset |∩|, pure codegen. */
  private def bitsetInter =
    expr("aggregate(zip_with(m1, m2, (x, y) -> bit_count(x & y)), 0, (a, x) -> a + x)")

  val defs: Seq[QueryDef] = Seq(

    // P7+P8: variation codec round-trip as a distributed invariant —
    // decode(encode(seq, ref), ref) == seq for equal-length gap-free pairs,
    // so the expected output is exactly one row per document with ok=1
    // (pirateToDatabase.py:175-197; extendingDB_FeatureAndStrainMetrics.py:21-29).
    QueryDef(
      "p7_variation_roundtrip",
      (s, d) => {
        GraftFunctions.register(s)
        T.documents(s, d)
          .withColumn("seq", substring(col("text"), 1, 80))
          .withColumn("ref", translate(col("seq"), "aeiou", "eioua"))
          .withColumn("enc", expr("variation_encode_native(seq, ref)"))
          .withColumn("dec", expr("variation_decode_native(enc, ref)"))
          .select(col("doc_id"),
            (col("dec") === col("seq")).cast("int").as("roundtrip_ok"))
          .orderBy(col("doc_id"))
      },
      Some("SELECT doc_id, 1 AS roundtrip_ok FROM documents ORDER BY doc_id"),
      doc = "SURVEY P7/P8; pirateToDatabase.py:175-197"),

    // P10: CAI over derived DNA (extendingDB_FeatureAndStrainMetrics.py:45-68).
    // The distributed form is the quantized-log kernel (CaiQuantizedExpr,
    // one codegen pass, packed-codon table lookup): the Sharp & Li
    // weights' ln values are embedded as integers in BOTH engines, which
    // makes CAI = exp(Σ lnw / (n−1)) an exact integer aggregate and
    // therefore DuckDB-oracle-matchable (was `no_oracle` through r4).
    // Biopython NaN quirks (illegal codon, n≤1 mean) are reproduced in
    // both; CaiRelationalSpec pins kernel == relational SQL form ==
    // scalar caiForGene (up to the documented 1e-9 quantization).
    QueryDef(
      "p10_cai",
      (s, d) => {
        GraftFunctions.register(s)
        graft.functions.GraftExtensions.registerInto(s)
        T.documents(s, d)
          .withColumn("dna", dnaOf(col("text")))
          .select(col("doc_id"),
            expr("cai_quantized(dna)").as("cai"),
            expr("gc_content(dna)").as("gc"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, translate(regexp_replace(upper(text), '[^A-Z]', '', 'g'),
              |    'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'ACGTACGTACGTACGTACGTACGTAC') AS dna
              |  FROM documents),
              |w AS (SELECT * FROM (VALUES ${graft.functions.Cai.lnqValuesSql}) AS t(codon, lnq)),
              |cod AS (
              |  SELECT doc_id, substring(dna, CAST(i AS INT), 3) AS codon
              |  FROM (SELECT doc_id, dna, unnest(range(1, length(dna) + 1, 3)) AS i FROM d)),
              |agg AS (
              |  SELECT c.doc_id,
              |    count(CASE WHEN w.lnq IS NOT NULL AND c.codon NOT IN ('ATG','TGG') THEN 1 END) AS n,
              |    sum(CASE WHEN w.lnq IS NOT NULL AND c.codon NOT IN ('ATG','TGG') THEN w.lnq ELSE 0 END) AS qsum,
              |    count(CASE WHEN w.lnq IS NULL AND c.codon NOT IN ('TGA','TAA','TAG') THEN 1 END) AS bad
              |  FROM cod c LEFT JOIN w ON c.codon = w.codon GROUP BY c.doc_id)
              |SELECT d.doc_id,
              |  CASE WHEN a.doc_id IS NULL THEN CAST(1.0 AS DOUBLE)
              |       WHEN a.bad > 0 THEN CAST(NULL AS DOUBLE)
              |       WHEN a.n = 0 THEN CAST(1.0 AS DOUBLE)
              |       WHEN a.n = 1 THEN CAST(NULL AS DOUBLE)
              |       ELSE floor(exp((CAST(a.qsum AS DOUBLE) / 1e9) / (a.n - 1)) * 1e9 + 0.5) / 1e9
              |  END AS cai,
              |  CASE WHEN length(d.dna) = 0 THEN CAST(0.0 AS DOUBLE)
              |       ELSE CAST((length(d.dna) - length(translate(d.dna, 'GC', ''))) * 100.0 AS DOUBLE)
              |            / length(d.dna)
              |  END AS gc
              |FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
              |ORDER BY d.doc_id""".stripMargin),
      doc = "SURVEY P10; extendingDB_FeatureAndStrainMetrics.py:45,54-68"),

    // P11+P12: z-score vs group stats + deviation threshold flag
    // (deviating = |z| >= 1.5, GIsInStrain.ipynb cells 3-4).
    QueryDef(
      "p11_deviation_flag",
      (s, d) => {
        val stats = T.events(s, d).groupBy(col("event_type"))
          .agg(eavg(col("value")).as("m"), estddev(col("value")).as("sd"))
        T.events(s, d)
          .join(broadcast(stats), "event_type")
          .select(col("event_id"),
            ((col("value") - col("m")) / col("sd")).as("z"),
            (abs((col("value") - col("m")) / col("sd")) >= 1.5).cast("int")
              .as("deviating"))
          .orderBy(col("event_id"))
      },
      Some(s"""WITH st AS (
              |  SELECT event_type, ${sqlAvg("value")} AS m, ${sqlStddev("value")} AS sd
              |  FROM events GROUP BY event_type)
              |SELECT event_id, (value - m) / sd AS z,
              |  CAST(abs((value - m) / sd) >= 1.5 AS INT) AS deviating
              |FROM events JOIN st USING (event_type)
              |ORDER BY event_id""".stripMargin),
      doc = "SURVEY P11/P12; GIsInStrain.ipynb:64-65,90-98"),

    // A12: phylogenetic pairwise distances — broadcast LCA-indexed Newick
    // tree + scalar distance over the J14 pair join (RGPs.ipynb:1618,1657).
    // Oracle = the hand-computed patristic distances of the fixed tree.
    QueryDef(
      "a12_tree_distance",
      (s, d) => {
        val idx = s.sparkContext.broadcast(Newick.index(TestTree))
        val dist = udf((a: String, b: String) => idx.value.distance(a, b))
        val types = T.events(s, d).select(col("event_type")).distinct()
        val a = types.select(col("event_type").as("a"))
        val b = types.select(col("event_type").as("b"))
        a.join(b, col("a") < col("b"))
          .select(col("a"), col("b"), dist(col("a"), col("b")).as("dist"))
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH t AS (SELECT DISTINCT event_type FROM events),
             |p AS (SELECT a.event_type AS a, b.event_type AS b
             |      FROM t a JOIN t b ON a.event_type < b.event_type),
             |g AS (SELECT * FROM (VALUES
             |  ('click','error',7.0),('click','purchase',7.0),
             |  ('click','signup',5.0),('click','view',3.0),
             |  ('error','purchase',10.0),('error','signup',8.0),
             |  ('error','view',8.0),('purchase','signup',4.0),
             |  ('purchase','view',8.0),('signup','view',6.0)) AS g(a, b, dist))
             |SELECT p.a, p.b, g.dist FROM p JOIN g ON p.a = g.a AND p.b = g.b
             |ORDER BY p.a, p.b""".stripMargin),
      doc = "SURVEY A12; RGPs.ipynb:1618,1657 cells 47-48"),

    // A17 (full): Welch t + Satterthwaite df + two-sided p. t and df are
    // straight-line IEEE arithmetic over the Exact-quantized moments, so
    // the oracle computes them directly; the p-value needs the Student-t
    // CDF (graft.functions.Stats), which DuckDB lacks — the 5-row result
    // is deterministic on the seeded fixture, so p joins from a golden
    // VALUES table (the a12 precedent), full-precision doubles captured
    // from the pinned CDF whose t-table fidelity FunctionsSpec asserts.
    // NOTE the goldens are pinned to the driver's verify fixture
    // (TESTDATA sf0.01, seed 42 — the only scale the oracle gate runs);
    // against other data the t/df columns still verify but p would fail
    // LOUDLY (value mismatch), never silently pass.
    // REGENERATION POLICY: these goldens must only ever be re-derived from
    // an EXTERNAL source (scipy.stats.t.sf / published tables), never from
    // this engine's own CDF — regenerating from Stats would turn the gate
    // into an echo. Two independent signals back them: FunctionsSpec pins
    // Stats.tTwoSidedP against published t-table critical values, and the
    // oracle below cross-checks each golden against an in-SQL normal
    // approximation (A&S 7.1.26 erfc; the fixture dfs are ~4000, where
    // |t-CDF − normal| < 1e-4) and emits a -1.0 poison value — a loud
    // hash mismatch — for any golden drifting > 0.005 from re-derivable
    // truth.
    QueryDef(
      "a17_welch_pvalue",
      (s, d) => {
        GraftFunctions.register(s)
        val e = T.events(s, d)
        val g = e.groupBy(col("event_type"))
          .agg(eavg(col("value")).as("m"), estddev(col("value")).as("sd"),
               count(lit(1)).as("n"))
        val bg = e.filter(col("event_type") === "view")
          .agg(eavg(col("value")).as("m2"), estddev(col("value")).as("sd2"),
               count(lit(1)).as("n2"))
        g.crossJoin(broadcast(bg))
          .withColumn("t_stat",
            (col("m") - col("m2")) /
            sqrt(col("sd") * col("sd") / col("n") + col("sd2") * col("sd2") / col("n2")))
          .withColumn("df", expr("welch_df(sd, n, sd2, n2)"))
          .withColumn("p_two_sided", expr("welch_p(t_stat, df)"))
          .select(col("event_type"), col("t_stat"), col("df"), col("p_two_sided"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH g AS (
              |  SELECT event_type, ${sqlAvg("value")} AS m,
              |         ${sqlStddev("value")} AS sd, count(*) AS n
              |  FROM events GROUP BY event_type),
              |bg AS (
              |  SELECT ${sqlAvg("value")} AS m2, ${sqlStddev("value")} AS sd2,
              |         count(*) AS n2
              |  FROM events WHERE event_type = 'view'),
              |-- golden doubles as VARCHAR -> DOUBLE: the string parse is
              |-- correctly rounded; a bare literal would go through DECIMAL
              |-- first and can land one ulp off
              |p AS (SELECT * FROM (VALUES
              |  ('click', '0.12671813638245288'),
              |  ('error', '0.4459837415438177'),
              |  ('purchase', '0.8515608604063982'),
              |  ('signup', '0.09857866418292527'),
              |  ('view', '1.0')) AS p(event_type, p_gold)),
              |s AS (
              |  SELECT g.event_type,
              |    (m - m2) / sqrt(sd * sd / n + sd2 * sd2 / n2) AS t_stat,
              |    (sd * sd / n + sd2 * sd2 / n2) * (sd * sd / n + sd2 * sd2 / n2)
              |      / ((sd * sd / n) * (sd * sd / n) / (n - 1)
              |         + (sd2 * sd2 / n2) * (sd2 * sd2 / n2) / (n2 - 1)) AS df
              |  FROM g, bg),
              |-- independent sanity on the goldens: two-sided normal
              |-- approximation of the t p-value via the Abramowitz-Stegun
              |-- 7.1.26 erfc polynomial (fixture dfs ~4000, where the
              |-- t-vs-normal gap is < 1e-4); a golden > 0.005 away from
              |-- this re-derivation poisons the output to -1.0 so the
              |-- gate fails LOUDLY instead of echoing a stale golden
              |z AS (SELECT s.*, 1.0 / (1.0 + 0.3275911 * (abs(t_stat) / sqrt(2.0))) AS u,
              |             abs(t_stat) / sqrt(2.0) AS zz FROM s)
              |SELECT z.event_type, z.t_stat, z.df,
              |  CASE WHEN abs(CAST(p.p_gold AS DOUBLE) -
              |      (u * (0.254829592 + u * (-0.284496736 + u * (1.421413741
              |        + u * (-1.453152027 + u * 1.061405429)))) * exp(-zz * zz)))
              |      < 0.005
              |    THEN CAST(p.p_gold AS DOUBLE) ELSE -1.0 END AS p_two_sided
              |FROM z JOIN p ON z.event_type = p.event_type
              |ORDER BY z.event_type""".stripMargin),
      doc = "SURVEY A17; RGPs.ipynb:1033-1069 cells 19-20"),

    // C1: Dice similarity over per-user event-type sets — the all-pairs
    // form the reference runs at N≈5k (RGPs.ipynb cell 70). The LSH-pruned
    // scale path is PipelineOps d2_minhash_lsh / operators.Similarity.
    //
    // Physical trick (r1 bench: c1/c2 were the ~7 s tail): the token
    // vocabulary (event_type × value-bucket) is tiny, so each user's set
    // is bitset-encoded into 4×64-bit words. |∩| = Σ bit_count(x & y) in
    // whole-stage codegen, and the quadratic pair join shuffles two longs
    // per row instead of a hashed-string array. Values are identical
    // (exact integer counts), so the oracle SQL is unchanged.
    QueryDef(
      "c1_dice_similarity",
      (s, d) => {
        val sets = bitsetUserSetsShared(s, d)
        val a = sets.select(col("user_id").as("u1"), col("mask").as("m1"), col("sz").as("z1"))
        val b = sets.select(col("user_id").as("u2"), col("mask").as("m2"), col("sz").as("z2"))
        a.join(b, col("u1") < col("u2"))
          .select(col("u1"), col("u2"),
            (bitsetInter * 2.0 / (col("z1") + col("z2"))).as("dice"))
          .filter(col("dice") < 1.0)
          .orderBy(col("u1"), col("u2"))
      },
      Some("""WITH sets AS (
             |  SELECT user_id, list_distinct(list(event_type || '#' ||
             |    CAST(CAST(floor(value / 20) AS BIGINT) AS VARCHAR))) AS types
             |  FROM events GROUP BY user_id)
             |SELECT a.user_id AS u1, b.user_id AS u2,
             |  len(list_intersect(a.types, b.types)) * 2.0
             |    / (len(a.types) + len(b.types)) AS dice
             |FROM sets a JOIN sets b ON a.user_id < b.user_id
             |WHERE len(list_intersect(a.types, b.types)) * 2.0
             |    / (len(a.types) + len(b.types)) < 1.0
             |ORDER BY u1, u2""".stripMargin),
      doc = "SURVEY C1; RGPs.ipynb:2073-2091 cell 70"),

    // C2: binary Jaccard distance over the same sets (pdist 'jaccard',
    // RGPs.ipynb cell 80); |∪| = |A|+|B|−|∩|, bitset-encoded like C1.
    QueryDef(
      "c2_jaccard_distance",
      (s, d) => {
        val sets = bitsetUserSetsShared(s, d)
        val a = sets.select(col("user_id").as("u1"), col("mask").as("m1"), col("sz").as("z1"))
        val b = sets.select(col("user_id").as("u2"), col("mask").as("m2"), col("sz").as("z2"))
        val uni = col("z1") + col("z2") - bitsetInter
        a.join(b, col("u1") < col("u2"))
          .select(col("u1"), col("u2"),
            (lit(1.0) - bitsetInter.cast("double") / uni).as("jaccard_dist"))
          .filter(col("jaccard_dist") > 0.0)
          .orderBy(col("u1"), col("u2"))
      },
      Some("""WITH sets AS (
             |  SELECT user_id, list_distinct(list(event_type || '#' ||
             |    CAST(CAST(floor(value / 20) AS BIGINT) AS VARCHAR))) AS types
             |  FROM events GROUP BY user_id)
             |SELECT u1, u2, jaccard_dist FROM (
             |  SELECT a.user_id AS u1, b.user_id AS u2,
             |    1.0 - CAST(len(list_intersect(a.types, b.types)) AS DOUBLE)
             |      / (len(a.types) + len(b.types) - len(list_intersect(a.types, b.types)))
             |      AS jaccard_dist
             |  FROM sets a JOIN sets b ON a.user_id < b.user_id) s
             |WHERE jaccard_dist > 0.0
             |ORDER BY u1, u2""".stripMargin),
      doc = "SURVEY C2; RGPs.ipynb:2598 cell 80"),

    // C3+C4: complete-linkage clustering, flat cut, label histogram
    // (linkage + fcluster, RGPs.ipynb cells 85-93) — size-dispatched via
    // Similarity.cluster: exact driver-side linkage at reference scale
    // (scipy fidelity), MinHash-LSH similarity graph + connected
    // components above the driver-safe threshold.
    //
    // Oracle: the greedy merge loop itself as a DuckDB recursive CTE — an
    // independent re-derivation, not a golden dump. Semantics mirrored
    // from Agglomerative.completeLinkageCut exactly: point indices are
    // STRING-order ranks of user_id (Similarity.cluster casts the id to
    // string before orderBy), a cluster's id is its minimum member index
    // (merges always land in the smaller index), the merged pair is the
    // lexicographically first (c1, c2) among pairs achieving the global
    // minimum complete-linkage (max-pairwise-Jaccard-distance) — the
    // NN-chain cache in the Scala kernel is pick-order-equivalent to this
    // full scan because complete-linkage distances only grow — and merging
    // stops when the minimum exceeds the cutoff (<= 0.3 merges). The
    // assignment rides the recursion as ONE list-valued row (DuckDB allows
    // a single recursive self-reference, so the per-point table form's
    // self-join is unavailable); distances are exact-integer ratios
    // (1.0 - i/u), so both engines' doubles are bit-identical and every
    // comparison/tiebreak agrees. Oracle cost is O(merges × N²) — instant
    // at the sf0.01 gate (150 users, 27 merges), sized for that gate by
    // design (sf0.1's 554 merges × 1.1M pair rows is minutes-plus; the
    // sf0.01 DuckDB compare IS the driver's correctness check).
    QueryDef(
      "c3_hierarchical_clustering",
      (s, d) => {
        val sets = T.events(s, d).groupBy(col("user_id"))
          .agg(collect_set(concat(col("event_type"), lit("#"),
            floor(col("value") / 20).cast("long"))).as("types"))
        Similarity.cluster(sets, "user_id", "types", cutoff = 0.3)
          .groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
          .orderBy(col("label"))
      },
      Some("""WITH RECURSIVE
             |pts AS (
             |  SELECT row_number() OVER (ORDER BY CAST(user_id AS VARCHAR)) AS pid,
             |         list_distinct(list(event_type || '#' ||
             |           CAST(CAST(floor(value / 20) AS BIGINT) AS VARCHAR))) AS types
             |  FROM events GROUP BY user_id),
             |pd AS (
             |  SELECT a.pid AS i, b.pid AS j,
             |    1.0 - CAST(len(list_intersect(a.types, b.types)) AS DOUBLE)
             |        / (len(a.types) + len(b.types) - len(list_intersect(a.types, b.types))) AS d
             |  FROM pts a JOIN pts b ON a.pid < b.pid),
             |asg AS (
             |  SELECT 0 AS it, list(pid ORDER BY pid) AS cls FROM pts
             |  UNION ALL
             |  SELECT it + 1,
             |    list_transform(cls, c -> CASE WHEN c = m.c2 THEN m.c1 ELSE c END)
             |  FROM asg, LATERAL (
             |     SELECT c1, c2 FROM (
             |        SELECT least(cls[p.i], cls[p.j]) AS c1,
             |               greatest(cls[p.i], cls[p.j]) AS c2, max(p.d) AS d
             |        FROM pd p
             |        WHERE cls[p.i] <> cls[p.j]
             |        GROUP BY 1, 2)
             |     WHERE d <= 0.3 ORDER BY d, c1, c2 LIMIT 1) m),
             |fin AS (SELECT cls FROM asg ORDER BY it DESC LIMIT 1),
             |sizes AS (
             |  SELECT cl, count(*) AS cluster_size
             |  FROM fin, unnest(fin.cls) AS t(cl) GROUP BY cl)
             |SELECT row_number() OVER (ORDER BY cl) AS label, cluster_size
             |FROM sizes ORDER BY label""".stripMargin),
      doc = "SURVEY C3/C4; RGPs.ipynb:2671,2712,2895 cells 85-93")
  )
}

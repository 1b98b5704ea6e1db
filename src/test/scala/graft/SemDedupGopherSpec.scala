package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d13_semdedup / t12_gopher_rules over planted data that moves what the
  * sf corpora can't: a 2-d embedding geometry whose cluster assignment,
  * duplicate cliques, and keep-priority are hand-derivable, and document
  * texts that trip every Gopher rule (bullets, ellipses, symbols,
  * one-char words) — the sf documents are single-line symbol-free prose,
  * so those flags only move here.
  */
class SemDedupGopherSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The query's quantized-cosine fixed-point, mirrored exactly. */
  private def cqc(dot: Long, nn1: Long, nn2: Long): Double =
    math.floor(dot.toDouble / math.sqrt(nn1.toDouble * nn2.toDouble) * 1e6 + 0.5) / 1e6

  test("d13: clique collapses to the farthest-from-centroid member; dissimilar co-members survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d13").toString
    // Centroids are vec_id % 50 == 0. Cluster A = {0:[1,0], 1:[.9,.1],
    // 2:[.92,.08]} — a mutual-duplicate clique (all pair cosines > 0.99),
    // so exactly one survivor: vec 1, the member with the LOWEST cosine
    // to the centroid (the paper's keep-farthest rule). Cluster B =
    // {50:[0,1], 51:[-.7,.72], 52:[.7,.72]} — 51 and 52 are each dups of
    // the centroid member 50 (cos ≈ 0.717) but NOT of each other
    // (cos ≈ 0.028 < 0.3), so 50 drops and both wings survive. Vec 100
    // seeds a singleton cluster C = {100:[-1,0]} — no pair, survives.
    Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.92f, 0.08f)),
      (50L, Seq(0.0f, 1.0f)), (51L, Seq(-0.7f, 0.72f)), (52L, Seq(0.7f, 0.72f)),
      (100L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("d13_semdedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // quantized frames: q1=[900,100] nn=820000; q51=[-700,720], q52=[700,720]
    // nn=1008400; centroid A nn=1e6, B nn=1e6, C nn=1e6
    assert(out.toSeq == Seq(
      (1L, 0L, cqc(900000L, 820000L, 1000000L)),
      (51L, 50L, cqc(720000L, 1008400L, 1000000L)),
      (52L, 50L, cqc(720000L, 1008400L, 1000000L)),
      (100L, 100L, 1.0)))
  }

  test("d13: the sf0.01 run prunes and is a strict subset keyed by cluster") {
    val out = SparkEntry.queries("d13_semdedup")(spark, "/root/testdata/sf0.01")
      .collect()
    // the synthetic corpus has 248 within-cluster pairs above tau = 0.3,
    // so the prune must actually drop rows but never a whole corpus
    assert(out.length > 0 && out.length < 500)
    // survivors are unique vec_ids
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }

  test("d13 guard: an oversized cluster sub-splits deterministically; recall is per bucket") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    // 24 identical vectors, one cluster (centroid = vec 0): the
    // mega-cluster shape where the pair scan is quadratic in cluster
    // size. Unguarded -> one survivor (the whole clique collapses).
    val base = (0L until 24L).map(i => (i, Seq(1000L, 0L))).toDF("vec_id", "q")
      .withColumn("nn",
        expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
    val unguarded = graft.operators.PipelineOps
      .semDedup(base, 50L, 0.3, "guard_off", "t")
      .collect().map(_.getLong(0)).toSet
    assert(unguarded == Set(0L))
    // maxCluster = 8 -> ceil(24/8) = 3 hash buckets; pairs only form
    // inside a bucket, so the survivors are exactly the per-bucket
    // minimum ids (all cqc tie at 1e6) — the bounded-recall trade the
    // guard documents
    val guarded = graft.operators.PipelineOps
      .semDedup(base, 50L, 0.3, "guard_on", "t", maxCluster = 8)
      .collect().map(_.getLong(0)).toSet
    val buckets = spark.range(24)
      .selectExpr("id", "pmod(xxhash64(id), 3L) AS b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = buckets.groupBy(_._2).map(_._2.map(_._1).min).toSet
    assert(guarded == expected, s"got $guarded expected $expected")
    assert(guarded.size > 1 && guarded.size <= 3)
  }

  test("t12: every Gopher rule trips on its planted document") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_t12").toString
    Seq(
      // 1: passes all — 20 words, mean length in [3,10], stopwords the/of
      (1L, "the quick brown foxes jumped over lazy dogs while many other " +
        "small animals watched from of green field near town"),
      // 2: bullet list — 2/2 lines bullet-started (> 90%); also too short
      (2L, "- alpha beta gamma\n- delta epsilon zeta"),
      // 3: ellipsis — 2/3 lines ellipsis-ended (> 30%) and 2 symbols vs 7 words
      (3L, "waiting for more...\nand then some more...\nshort tail"),
      // 4: one-char words — mean word length 1 < 3
      (4L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      // 5: hash runs — 6 '#' among 6 words; '##' words also fail the alpha rule
      (5L, "## ## ## data value rows"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("t12_gopher_rules")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7), r.getInt(8),
        r.getInt(9)))
    assert(out.toSeq == Seq(
      //  id nw  words mlen sym bull ell alpha stop pass
      (1L, 20, 1, 1, 1, 1, 1, 1, 1, 1),
      (2L, 7, 0, 1, 1, 0, 1, 1, 0, 0),
      (3L, 7, 0, 1, 0, 1, 0, 1, 0, 0),
      (4L, 26, 1, 0, 1, 1, 1, 1, 0, 0),
      (5L, 6, 0, 1, 0, 1, 1, 0, 0, 0)))
  }
}

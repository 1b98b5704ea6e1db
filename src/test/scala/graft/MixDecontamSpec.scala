package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d10_decontaminate / t6_stratified_sample / x8_training_mix over planted
  * corpora that move every stage the homogeneous sf-testdata can't: a
  * copied eval 6-gram (d10's hit), a skewed language mix (t6's quota
  * actually drops documents — at sf0.01 the gated corpus is single-lang so
  * x8's sampler keeps everything), and a contaminated gated doc inside the
  * x8 funnel. Expected values are hand-derived, including the portable
  * sample hash h(id) = ((id mod p) * 2654435761 + 2246822519) mod p.
  */
class MixDecontamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val P = 1000000007L
  private def h(id: Long): Long = ((id % P) * 2654435761L + 2246822519L) % P

  private def writeDocs(rows: Seq[(Long, String, String)], tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    rows.toDF("doc_id", "text", "lang").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("d10: a copied eval 6-gram flags exactly the copying train doc") {
    val dir = writeDocs(Seq(
      // train doc 1 copies eval doc 7's first 6-gram, then diverges:
      // 10 tokens => 5 gram positions, 1 of them contaminated
      (1L, "alpha beta gamma delta epsilon zeta different tail here now", "en"),
      // train doc 2 shares nothing with the eval slice
      (2L, "totally unrelated words about nothing important here at all ok", "en"),
      // the eval slice (doc_id % 10 == 7): 8 tokens => 3 grams
      (7L, "alpha beta gamma delta epsilon zeta eta theta", "en")), "d10")

    val out = SparkEntry.queries("d10_decontaminate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    // eval doc 7 itself is NOT a result row; frac = 1 distinct hit / 5 grams
    assert(out.toSeq == Seq(
      (1L, 5L, 1L, 0.2, 1),
      (2L, 5L, 0L, 0.0, 0)))
  }

  test("t6: skewed mix downsamples the majority lang by the hash gate, exactly") {
    val dir = writeDocs(Seq(
      (0L, "x", "en"), (1L, "x", "en"), (2L, "x", "en"), (3L, "x", "en"),
      (10L, "x", "fr"), (11L, "x", "fr")), "t6")

    val out = SparkEntry.queries("t6_stratified_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // quota = 2 (fr). en (cnt 4): keep iff h*4 < 2p <=> h < p/2 => ids 0, 3
    // (h(1), h(2) land in the upper half); fr (cnt = quota): keep all.
    assert(out.toSeq == Seq(
      (0L, "en", h(0)), (3L, "en", h(3)),
      (10L, "fr", h(10)), (11L, "fr", h(11))))
    assert(Seq(0L, 3L, 10L, 11L).forall(i => h(i) < P / 2 || i >= 10L))
  }

  test("x8: decontamination and the mix sampler both move the funnel") {
    val dir = writeDocs(Seq(
      // gated en docs (10 tokens, quality 1.0, s_en > 0)
      (1L, "the quick brown fox jumps over the lazy dog again", "en"),
      (2L, "a calm river flows through the quiet green valley today", "en"),
      // gated en doc that copies eval doc 7's first 6-gram => contaminated
      (3L, "the alpha beta gamma delta epsilon zeta is of and", "en"),
      // gated de doc (11 tokens; "is" rides along for the quality gate)
      (4L, "der hund und die katze von haus ist gross is here", "de"),
      (6L, "the tall oak tree stands near a wide open field", "en"),
      // the eval slice
      (7L, "alpha beta gamma delta epsilon zeta eta theta", "en")), "x8")

    val out = SparkEntry.queries("x8_training_mix")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // gated train = {1,2,3,4,6}; decontamination drops 3 => clean = 4 docs,
    // en cnt 3 / de cnt 1, quota 1. en keeps iff h < p/3 => only doc 6
    // (h(1), h(2) too big); de keeps its single doc 4 (cnt == quota).
    // Both survivors hash to shard 7; tokens 10 (en) + 11 (de).
    assert(h(1) * 3 >= P && h(2) * 3 >= P && h(6) * 3 < P)
    assert(h(4) % 8 == 7 && h(6) % 8 == 7)
    assert(out.toSeq == Seq((7L, 2L, 2L, 21L, 5L, 4L)))
  }
}

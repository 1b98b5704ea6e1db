package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** x6_corpus_pipeline over a crafted corpus that exercises EVERY funnel
  * stage — the sf0.01 oracle run is homogeneous English with no exact
  * dups, so this spec plants what the testdata can't: multiple
  * languages, a quality reject, an exact duplicate, and a near-dup pair,
  * then checks each stage's survivor count and the final rollup against
  * hand-derived values.
  */
class CorpusPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("every funnel stage moves the counts it should") {
    import spark.implicits._
    // ten tokens each (passes n_toks >= 5 and mean_tok_len in [3, 10]);
    // stopwords present => stop_ratio > 0 => quality = 1.0
    val enBase = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      // en cluster: 1 unique + 1 exact dup (normalized: case/extra
      // spaces collapse) + 1 near-dup (one token changed => bigram
      // Jaccard well above 0.5)
      (1L, enBase),
      (2L, "  THE   quick brown fox jumps over the lazy dog again "),
      (3L, "the quick brown fox jumps over the lazy cat again"),
      // de doc: quality needs a stopword from t2's EN-centric list —
      // "is" rides along; der/die/und/ist/von outscore it for lang
      (4L, "der hund und die katze von haus ist gross is here"),
      // quality reject: four tokens => n_toks >= 5 fails, stop_ratio
      // and mean_tok_len terms survive => quality 0.6 < 0.7
      (5L, "the small tidy list"),
      // lang reject: no seed stopword from any language list
      (6L, "zzz qqq www rrr ttt yyy uuu iii ooo ppp"))
    val dir = java.nio.file.Files.createTempDirectory("graft_x6").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("x6_corpus_pipeline")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))

    // funnel: 6 docs -> quality gate drops 5 -> lang gate drops 6 ->
    // exact dedup drops 2 (dup of 1) -> near-dup drops 3 (pair 1<3)
    // de: 11 tokens, survives everything alone
    assert(out.toSeq == Seq(
      ("de", 1L, 1L, 1L, 11L, 1.0),
      ("en", 3L, 2L, 1L, 10L, 1.0)))
  }

  test("x6b full funnel: repetition gate and span dedup move the counts they should") {
    import spark.implicits._
    val enBase = "the quick brown fox jumps over the lazy dog again"
    // an 8-token span shared by docs 8 and 9 whose surrounding 16 tokens
    // are disjoint: bigram Jaccard 7/39 ≈ 0.18 < 0.5, so BOTH survive
    // minhash near-dup — but the three 6-grams fully inside the span are
    // cross-document duplicates, so span dedup merges them into one
    // 8-token covered span per doc
    val sharedSpan = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, enBase),
      (2L, "  THE   quick brown fox jumps over the lazy dog again "),
      (3L, "the quick brown fox jumps over the lazy cat again"),
      (4L, "der hund und die katze von haus ist gross is here"),
      (5L, "the small tidy list"),
      (6L, "zzz qqq www rrr ttt yyy uuu iii ooo ppp"),
      // repetition reject: "the cat" holds 11 of 22 bigram positions
      // (11·25 > 2·22, and nb >= 20 so the gate applies — shorter docs
      // like 1-4 are exempt); quality scores exactly 0.7 (mean token
      // length 68/23 < 3 costs the length term) and lang passes, so
      // ONLY the repetition gate can drop it
      (7L, Iterator.fill(11)("the cat").mkString(" ") + " is"),
      (8L, "the ancient forest murmurs softly beneath silver moonlight " +
        sharedSpan + " while distant rivers carve valleys through quiet stone"),
      (9L, "a clever merchant counts coins inside wooden stalls " +
        sharedSpan + " before morning light reaches crowded market squares today"))
    val dir = java.nio.file.Files.createTempDirectory("graft_x6b").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("x6b_corpus_pipeline_full")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))

    // en funnel: 6 gated (1,2,3,7,8,9) -> repetition drops 7 -> exact
    // dedup drops 2 -> near-dup drops 3 -> survivors {1, 8, 9}, 58
    // tokens; span dedup covers the 8-token shared span in BOTH 8 and 9
    // (merged from the three duplicated 6-gram positions each) -> 16
    // span tokens, 42 clean. de: doc 4 sails through alone, untouched.
    assert(out.toSeq == Seq(
      ("de", 1L, 1L, 1L, 1L, 11L, 0L, 11L),
      ("en", 6L, 5L, 4L, 3L, 58L, 16L, 42L)))
  }
}

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
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d9 (cross-document duplicate n-gram spans) and t5 (within-document
  * repetition metrics) pinned on a handcrafted corpus with fully
  * enumerable n-gram structure: planted shared 6-grams, a pathological
  * all-same-token document, sub-n documents, and an empty document.
  */
class DupSpansSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_dupspans").toString
    Seq(
      1L -> "a b c d e f g h",     // shares 6-gram "a b c d e f" with 2 and 6
      2L -> "a b c d e f x y",
      3L -> "z z z z z z z z z z", // max within-doc repetition, no cross-doc dup
      4L -> "short one",           // below n: zero 6-grams, one bigram
      5L -> "",                    // empty: zero tokens everywhere
      6L -> "A B C D E F q r",     // case-normalizes into the shared 6-gram
      7L -> "x y x y x y z",       // known bigram/trigram repetition counts
      8L -> "p q r s t u v w",     // 8/9 share ALL their 6-grams: overlap merge
      9L -> "p q r s t u v w zz",
      10L -> ("a b c d e f g1 g2 g3 g4 g5 g6 g7 p q r s t u")
      // doc 10: two duplicated spans separated by unique tokens -> two islands
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("d9: cross-document duplicate 6-gram spans, case-normalized") {
    val rows = SparkEntry.queries("d9_dup_ngram_spans")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(rows.keySet == (1L to 10L).toSet)
    // "a b c d e f" lives in docs 1, 2, 6 (via lower()) and 10; every
    // other 6-gram of docs 1-7 is unique to its document
    assert(rows(1L) == ((3L, 1L, 1L, 1.0 / 3)))
    assert(rows(2L) == ((3L, 1L, 1L, 1.0 / 3)))
    assert(rows(6L) == ((3L, 1L, 1L, 1.0 / 3)))
    // doc 3 repeats its 6-gram 5x WITHIN the doc — not a cross-doc dup
    assert(rows(3L) == ((5L, 0L, 0L, 0.0)))
    assert(rows(4L) == ((0L, 0L, 0L, 0.0)))
    assert(rows(5L) == ((0L, 0L, 0L, 0.0)))
    assert(rows(7L) == ((2L, 0L, 0L, 0.0)))
    // docs 8/9 share all of doc 8's grams; doc 10 carries one gram from
    // the 1/2/6 group and one from the 8/9 group
    assert(rows(8L) == ((3L, 3L, 3L, 1.0)))
    assert(rows(9L) == ((4L, 3L, 3L, 0.75)))
    assert(rows(10L) == ((14L, 2L, 2L, 2.0 / 14)))
  }

  test("d9b: duplicated positions merge into maximal spans per document") {
    val spans = SparkEntry.queries("d9b_dup_span_merge")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(spans == Seq(
      // the shared "a b c d e f" covers tokens 1-6 in docs 1, 2, 6
      (1L, 1L, 6L, 6L),
      (2L, 1L, 6L, 6L),
      (6L, 1L, 6L, 6L),
      // docs 8/9: dup positions 1,2,3 overlap -> ONE span over tokens 1-8
      (8L, 1L, 8L, 8L),
      (9L, 1L, 8L, 8L),
      // doc 10: positions 1 and 14 are > n apart -> two separate islands
      (10L, 1L, 6L, 6L),
      (10L, 14L, 19L, 6L)))
  }

  test("d9b: the dup-digest join is not force-broadcast (scale contract)") {
    // the set of n-grams occurring in >1 document is unbounded over a real
    // corpus; a broadcast() hint would override Spark's size threshold and
    // OOM the driver at exactly the scale the operator targets. The static
    // plan must be the shuffled digest join; only AQE may upgrade it at
    // runtime based on the OBSERVED size.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = SparkEntry.queries("d9b_dup_span_merge")(spark, dir)
    val hinted = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.hint.leftHint.nonEmpty || j.hint.rightHint.nonEmpty => j
    }
    assert(hinted.isEmpty, s"join hints found in d9b: $hinted")
  }

  test("t5: within-document repetition metrics") {
    val rows = SparkEntry.queries("t5_repetition")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    // doc 1: 7 distinct bigrams, 6 distinct trigrams — no repetition
    assert(rows(1L) == ((1L, 7L, 1.0 / 7, 0L, 6L, 0.0)))
    // doc 3: ten 'z' tokens — every bigram and trigram identical
    assert(rows(3L) == ((9L, 9L, 1.0, 8L, 8L, 1.0)))
    // doc 4: a single bigram occupies the whole doc; no trigram exists
    assert(rows(4L) == ((1L, 1L, 1.0, 0L, 0L, 0.0)))
    assert(rows(5L) == ((0L, 0L, 0.0, 0L, 0L, 0.0)))
    // doc 7 "x y x y x y z": bigrams x_y=3, y_x=2, y_z=1 -> top 3/6;
    // trigrams x_y_x=2, y_x_y=2, x_y_z=1 -> dup positions 4/5
    assert(rows(7L) == ((3L, 6L, 0.5, 4L, 5L, 0.8)))
  }
}

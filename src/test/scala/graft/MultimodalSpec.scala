package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Edge branches of the multimodal stub codecs that the synthetic corpus
  * never exercises (sf* documents are all ≥ 48 chars, no nulls): the m4
  * box-filter resize on empty / shorter-than-thumbnail / non-multiple
  * payloads and null text, checked against an independent per-codepoint
  * reference fold.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def refThumb(text: String): String = {
    val cps = if (text == null) Array.empty[Int] else text.codePoints().toArray
    (0 until 16).map { b =>
      val slice = cps.slice(b * cps.length / 16, (b + 1) * cps.length / 16)
      if (slice.isEmpty) -1L else slice.map(_.toLong).sum / slice.length
    }.mkString(",")
  }

  test("m4 resize: empty, null, sub-thumbnail, and non-multiple lengths") {
    import spark.implicits._
    val docs = Seq[(Long, String)](
      (1L, ""),                       // empty -> all buckets -1
      (2L, null),                     // null text = empty payload contract
      (3L, "abcde"),                  // L < 16: 11 empty buckets interleave
      (4L, "0123456789abcdef"),       // L == 16: one codepoint per bucket
      (5L, "z" * 37),                 // non-multiple: buckets of 2 and 3
      (6L, (0 until 160).map(i => ('a' + i % 26).toChar).mkString))
    val dir = java.nio.file.Files.createTempDirectory("graft_m4").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("m4_resize_thumbnail")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    val want = docs.map { case (id, t) =>
      (id, if (t == null) 0L else t.codePoints().count(), refThumb(t))
    }.sortBy(_._1).toList
    assert(got == want)
    // L == 16 really is the identity resize
    assert(got.find(_._1 == 4L).get._3 ==
      "0123456789abcdef".map(_.toLong).mkString(","))
  }
}

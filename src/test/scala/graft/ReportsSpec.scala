package graft

import graft.operators.Reports
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** S13 — the clipboard/report sink: headerless delimited rendering, null
  * handling, driver guard, and string/file agreement.
  */
class ReportsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def frame = {
    import spark.implicits._
    Seq(("g1", 3L, 0.5), ("g2", 1L, 1.0), ("g3", 0L, 2.25))
      .toDF("cluster_id", "n", "score")
      .orderBy("cluster_id")
  }

  test("to_clipboard analogue: headerless, index-free, chosen separator") {
    assert(Reports.delimitedString(frame, ",") ==
      "g1,3,0.5\ng2,1,1.0\ng3,0,2.25")
    assert(Reports.delimitedString(frame, "\t") ==
      "g1\t3\t0.5\ng2\t1\t1.0\ng3\t0\t2.25")
  }

  test("nulls render as empty fields") {
    import spark.implicits._
    val df = Seq(("a", Some(1)), ("b", None)).toDF("k", "v")
      .orderBy("k")
    assert(Reports.delimitedString(df, ",") == "a,1\nb,")
  }

  test("driver guard: oversized frames fail loudly") {
    import spark.implicits._
    val big = (1 to 50).toDF("x")
    val e = intercept[IllegalArgumentException] {
      Reports.delimitedString(big, ",", maxRows = 10)
    }
    assert(e.getMessage.contains("use a data sink"))
  }

  test("single-file variant agrees with the driver string") {
    val dir = java.nio.file.Files.createTempDirectory("graft_report").toString
    Reports.writeDelimited(frame, s"$dir/out", "\t")
    val part = new java.io.File(s"$dir/out").listFiles()
      .filter(f => f.getName.startsWith("part-")).toSeq
    assert(part.size == 1, "report must be a single file")
    val content = new String(
      java.nio.file.Files.readAllBytes(part.head.toPath),
      java.nio.charset.StandardCharsets.UTF_8).stripTrailing()
    assert(content == Reports.delimitedString(frame, "\t"))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** p17_json_extract: the null path is the point — a missing key,
  * malformed JSON, or NULL props column must COUNT (n_null_k) and
  * contribute zero to the sums, never vanish or throw. The happy path
  * is re-derived in plain Scala.
  */
class JsonExtractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("p17: extraction aggregates with full null-path accounting") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_p17").toString
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 1.0, """{"k": 7}"""),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "click", 1.0, """{"k": -3}"""),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 2L, "click", 1.0, """{"other": 9}"""), // key missing
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 2L, "view", 1.0, """not json at all"""), // malformed
      (5L, java.sql.Timestamp.valueOf("2024-01-01 00:04:00"), 3L, "view", 1.0, null.asInstanceOf[String]), // null column
      (6L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 3L, "view", 1.0, """{"k": 100}"""),
      (7L, java.sql.Timestamp.valueOf("2024-01-01 00:06:00"), 4L, "buy", 1.0, """{"k": "7"}"""), // numeric string: reads 7
      (8L, java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), 4L, "buy", 1.0, """{"k": 7.5}"""), // non-integral: null (ANSI try_cast)
      (9L, java.sql.Timestamp.valueOf("2024-01-01 00:08:00"), 4L, "buy", 1.0, """{"k": "abc"}""")) // non-numeric string: null
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("p17_json_extract")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // click: k = 7, -3, missing -> n=3, null=1, sum=4, min=-3, max=7
    assert(out("click") == ((3L, 1L, 4L, -3L, 7L)))
    // view: malformed, null props, k=100 -> n=3, null=2, sum=100
    assert(out("view") == ((3L, 2L, 100L, 100L, 100L)))
    // buy: "7" reads 7; 7.5 and "abc" must be NULL, never a throw —
    // the ANSI try_cast contract
    assert(out("buy") == ((3L, 2L, 7L, 7L, 7L)))
  }
}

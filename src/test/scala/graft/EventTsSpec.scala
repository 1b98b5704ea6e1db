package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.normalizeEventTs]] across the two physical types
  * events.ts has shipped as (the testdata is regenerated per round and
  * has switched between them): TIMESTAMP(NANOS) arriving as Long under
  * nanosAsLong, and TIMESTAMP(MICROS, isAdjustedToUTC=false) arriving as
  * TimestampNTZType. The current testdata only exercises one branch, so
  * both are pinned synthetically here — same instants in, same µs
  * TimestampType out.
  */
class EventTsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val micros = Seq(0L, 1L, 1700000000000000L, 1700000000123456L)

  test("Long nanos and TimestampNTZ generations normalize to the same instants") {
    val fromNanos = Tables.normalizeEventTs(
      spark.createDataFrame(
        spark.sparkContext.parallelize(micros.map(us => org.apache.spark.sql.Row(us * 1000L))),
        StructType(Seq(StructField("ts", LongType)))))
    val fromNtz = Tables.normalizeEventTs(
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          micros.map(us => org.apache.spark.sql.Row(
            java.time.LocalDateTime.ofEpochSecond(
              us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)))),
        StructType(Seq(StructField("ts", TimestampNTZType)))))
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    val a = fromNanos.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    val b = fromNtz.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(a.toSeq == micros.sorted && b.toSeq == micros.sorted)
  }

  test("already-TimestampType frames pass through untouched") {
    val df = spark.range(1).select(current_timestamp().as("ts"))
    assert(Tables.normalizeEventTs(df) eq df)
  }
}

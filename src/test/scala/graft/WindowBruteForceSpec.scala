package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5 item 2 — W1-W3 trailing windows vs a brute-force scala
  * reimplementation of pandas `rolling(n)` (inclusive, min_periods=1
  * semantics as the Spark frames express them) on seeded random chains.
  */
class WindowBruteForceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("rolling mean/sum/max frames match brute force on random chains") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- 0 until 13
      i <- 0 until (5 + rnd.nextInt(60))
    } yield (s"g$g", i.toLong, math.floor(rnd.nextDouble() * 1e6) / 1e4)
    val df = rows.toDF("grp", "pos", "x").repartition(4)

    val w = Window.partitionBy(col("grp")).orderBy(col("pos"))
    val got = df
      .withColumn("m10", avg(col("x")).over(w.rowsBetween(-9, 0)))
      .withColumn("s20", sum(col("x")).over(w.rowsBetween(-19, 0)))
      .withColumn("x5", max(col("x")).over(w.rowsBetween(-4, 0)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

    val byGroup = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector)
    for ((g, xs) <- byGroup; i <- xs.indices) {
      val w10 = xs.slice(math.max(0, i - 9), i + 1)
      val w20 = xs.slice(math.max(0, i - 19), i + 1)
      val w5 = xs.slice(math.max(0, i - 4), i + 1)
      val (m10, s20, x5) = got((g, i.toLong))
      assert(math.abs(m10 - w10.sum / w10.size) < 1e-9, s"$g/$i mean")
      assert(math.abs(s20 - w20.sum) < 1e-9, s"$g/$i sum")
      assert(x5 == w5.max, s"$g/$i max")
    }
  }
}

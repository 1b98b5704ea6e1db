package graft

import graft.operators.Skew
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k950", "A"), ("k999", "B"), ("miss", "X"))
      .toDF("key", "label")
    val plain = big.join(small, "key").select("key", "v", "label")
    val salted = Skew.saltedJoin(big, small, "key", salts = 8)
      .select("key", "v", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key actually scatters across salts
    val saltsUsed = big.filter(col("key") === "hot")
      .withColumn("s", pmod(xxhash64(struct(col("key"), col("v"))), lit(8)))
      .select("s").distinct().count()
    assert(saltsUsed > 4)
  }
}

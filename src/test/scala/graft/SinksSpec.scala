package graft

import graft.sources.PirateSources
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY S7 (CSV sink), S9 (FASTA sink), S12 (cached-result round-trip —
  * parquet keeps arrays native, no eval() hack like the reference's CSV).
  */
class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = java.nio.file.Files.createTempDirectory("graft_sinks").toString

  override def afterAll(): Unit = spark.stop()

  test("S7: CSV sink round-trips with header") {
    import spark.implicits._
    val df = Seq(("f1", 10L, "S1"), ("f2", 20L, "S1")).toDF("name", "start", "strain")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val back = spark.read.option("header", "true").csv(s"$dir/csv")
      .select(col("name"), col("start").cast("long"), col("strain"))
    assert(back.orderBy("name").collect().map(_.toSeq).toSeq ==
      df.orderBy("name").collect().map(_.toSeq).toSeq)
  }

  test("S9: FASTA sink writes parseable records") {
    import spark.implicits._
    val df = Seq(("c1", "clusterA", "ACGT"), ("c2", "clusterB", "GGCC"))
      .toDF("id", "desc", "seq")
    PirateSources.writeFasta(df, "id", "desc", "seq", s"$dir/fasta")
    val lines = spark.read.text(s"$dir/fasta").collect().map(_.getString(0))
      .flatMap(_.split("\n")).sorted
    assert(lines.count(_.startsWith(">")) == 2)
    assert(lines.contains(">c1 clusterA") && lines.contains("ACGT"))
  }

  test("S12: parquet round-trip preserves array columns natively") {
    import spark.implicits._
    val df = Seq((1L, Seq("g1", "g2"), Seq(1.5, 2.5)), (2L, Seq("g3"), Seq(3.0)))
      .toDF("id", "clusters", "gcs")
    df.write.mode("overwrite").parquet(s"$dir/pq")
    val back = spark.read.parquet(s"$dir/pq").orderBy("id").collect()
    assert(back(0).getSeq[String](1) == Seq("g1", "g2"))
    assert(back(1).getSeq[Double](2) == Seq(3.0))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class FastaSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("reads multi-line FASTA records across files via DataSource V2") {
    val dir = java.nio.file.Files.createTempDirectory("fasta_dsv2")
    java.nio.file.Files.writeString(dir.resolve("a.fasta"),
      ">r1 first record\nACGT\nACGT\n>r2\nGGG\nCCC\nTTT\n")
    java.nio.file.Files.writeString(dir.resolve("b.fasta"),
      ">r3 other file\nAAAA\n")
    val df = spark.read.format("fasta").load(dir.toString)
    val rows = df.orderBy("id").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("desc"), r.getAs[String]("seq")))
    assert(rows.toSeq == Seq(
      ("r1", "first record", "ACGTACGT"),
      ("r2", "", "GGGCCCTTT"),
      ("r3", "other file", "AAAA")))
    // one partition per file
    assert(df.rdd.getNumPartitions == 2)
  }

  test("reads the minipan representative sequences") {
    val path = getClass.getResource("/minipan/representative_sequences.ffn").getPath
    val df = spark.read.format("fasta").load(path)
    assert(df.count() == 9)
    assert(df.filter(col("id").startsWith("g1;")).count() == 1)
  }
}

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

  test("DSv2 write: round-trips through the sink, wraps at 70 columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fasta_sink").toString
    val longSeq = "ACGT" * 40 // 160 chars -> 3 wrapped lines
    val df = Seq(
      ("r1", "first record", longSeq),
      ("r2", "", "GGGCCCTTT"),
      ("r3", "other", "AAAA")).toDF("id", "desc", "seq")
    df.repartition(1).write.format("fasta").mode("overwrite").save(dir)
    // wrapped on disk
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".fasta"))
    assert(files.length == 1, files.mkString(","))
    val text = new String(java.nio.file.Files.readAllBytes(files.head.toPath))
    assert(text.linesIterator.count(_.startsWith(">")) == 3)
    assert(text.linesIterator.forall(_.length <= 71))
    // round-trip: read back equals input
    val back = spark.read.format("fasta").load(dir)
      .select("id", "desc", "seq").orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(back.toSeq == Seq(
      ("r1", "first record", longSeq), ("r2", "", "GGGCCCTTT"), ("r3", "other", "AAAA")))
    // overwrite truncates: a second write leaves exactly one data file
    df.repartition(1).write.format("fasta").mode("overwrite").save(dir)
    assert(new java.io.File(dir).listFiles.count(_.getName.endsWith(".fasta")) == 1)
    assert(spark.read.format("fasta").load(dir).count() == 3)
  }

  test("reads the minipan representative sequences") {
    val path = getClass.getResource("/minipan/representative_sequences.ffn").getPath
    val df = spark.read.format("fasta").load(path)
    assert(df.count() == 9)
    assert(df.filter(col("id").startsWith("g1;")).count() == 1)
  }
}

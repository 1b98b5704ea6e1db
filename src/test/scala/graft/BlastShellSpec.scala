package graft

import graft.pangenome.BlastShell
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class BlastShellSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("pipes FASTA through a stub aligner and upserts annotations") {
    import spark.implicits._
    // stub "aligner": one fake hit per GC-rich record (id containing 'g')
    val stub = java.nio.file.Files.createTempFile("stub_blast", ".sh")
    java.nio.file.Files.writeString(stub,
      """#!/bin/sh
        |while read line; do
        |  case "$line" in
        |    ">"g*) id="${line#>}"; printf '%s\tfake phage\t42.5\n' "$id" ;;
        |  esac
        |done
        |""".stripMargin)
    stub.toFile.setExecutable(true)

    val clusters = Seq(
      ("g1", "ATG-GCA"), ("g2", "CCCC"), ("x9", "TTTT"),
      ("g3", null.asInstanceOf[String]))
      .toDF("cluster_id", "reference_sequence")

    val hits = BlastShell.runBlast(spark, clusters, Seq(stub.toString))
    val got = hits.orderBy("cluster_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("g1", "fake phage", 42.5), ("g2", "fake phage", 42.5)))

    val annotated = BlastShell.annotate(clusters, hits)
    val byId = annotated.collect()
      .map(r => r.getAs[String]("cluster_id") -> r.getAs[Boolean]("hasBlastVirusHit")).toMap
    assert(byId("g1") && byId("g2") && !byId("x9") && !byId("g3"))
    val titles = annotated.filter(col("cluster_id") === "g1")
      .select("blastTitlesVirus").head().getSeq[String](0)
    assert(titles == Seq("fake phage"))
  }
}

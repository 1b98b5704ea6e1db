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

  test("outfmt-5 XML pull-parser matches NCBIXML description semantics") {
    import graft.sources.BlastXml
    val xml = java.nio.file.Files.readString(java.nio.file.Paths.get(
      getClass.getResource("/blast/sample_blast.xml").getPath))
    val hits = BlastXml.parseString(xml).toSeq
    // one row per (query, hit); query with no hits contributes nothing
    assert(hits.length == 3)
    val h1 = hits.head
    // cluster_id = query-def up to first space (extendingDB_performingBlast.py:97)
    assert(h1.cluster_id == "g1")
    // title = "Hit_id Hit_def" (NCBIXML description.title)
    assert(h1.title == "gnl|BL_ORD_ID|0 Pseudomonas phage Pf1, complete genome")
    // score/e come from the FIRST HSP only; num_alignments counts HSPs
    assert(h1.score == 12.0 && h1.e == 0.001 && h1.num_alignments == 2)
    assert(hits(1) == BlastXml.Hit("g1",
      "gnl|BL_ORD_ID|3 Pseudomonas phage JBD30", 9.0, 0.2, 1))
    assert(hits(2) == BlastXml.Hit("g5",
      "gnl|BL_ORD_ID|7 Pseudomonas phage D3112", 15.0, 1e-5, 1))
  }

  test("XML hits flow through the distributed read and the annotate upsert") {
    import spark.implicits._
    val dir = getClass.getResource("/blast").getPath
    val hits = graft.sources.BlastXml.read(spark, dir)
    assert(hits.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      graft.sources.PirateSources.blastResultSchema.fields
        .map(f => (f.name, f.dataType)).toSeq)
    assert(hits.count() == 3)

    val clusters = Seq("g1", "g5", "g9").toDF("cluster_id")
    val annotated = BlastShell.annotate(clusters, hits)
    val g1 = annotated.filter(col("cluster_id") === "g1").head()
    // scores sorted descending like the title/score list pairing (A2)
    assert(g1.getSeq[Double](g1.fieldIndex("blastScoresVirus")).toSeq == Seq(12.0, 9.0))
    assert(g1.getAs[Boolean]("hasBlastVirusHit"))
    assert(!annotated.filter(col("cluster_id") === "g9").head()
      .getAs[Boolean]("hasBlastVirusHit"))
  }

  test("pipe -> XML parse: stub blastn emitting outfmt-5 on stdout") {
    import spark.implicits._
    // stub: swallow stdin, emit the sample document (the stdout contract
    // of `blastn -outfmt 5`)
    val stub = java.nio.file.Files.createTempFile("stub_blastx", ".sh")
    val sample = getClass.getResource("/blast/sample_blast.xml").getPath
    java.nio.file.Files.writeString(stub,
      s"""#!/bin/sh
         |cat > /dev/null
         |cat '$sample'
         |""".stripMargin)
    stub.toFile.setExecutable(true)

    val clusters = Seq(("g1", "ATGGCA"), ("g5", "CCCC"))
      .toDF("cluster_id", "reference_sequence").coalesce(1)
    val hits = BlastShell.runBlastXml(spark, clusters, Seq(stub.toString))
    assert(hits.count() == 3)
    assert(hits.select("cluster_id").distinct().collect()
      .map(_.getString(0)).toSet == Set("g1", "g5"))
  }

  test("real blastn end-to-end when the binary is on PATH (skipped otherwise)") {
    import spark.implicits._
    // env-gated: the true `blastn -outfmt 5` path of
    // extendingDB_performingBlast.py:63-80 — a self-hit against a one-record
    // nucleotide DB must surface through pipe -> StAX parse -> annotate.
    // Canceled (not failed) where the toolkit is absent; the stub-contract
    // tests above pin the same stdin/stdout/XML plumbing either way.
    def onPath(bin: String): Boolean =
      sys.env.getOrElse("PATH", "").split(':')
        .exists(p => new java.io.File(p, bin).canExecute)
    assume(onPath("blastn") && onPath("makeblastdb"),
      "blastn/makeblastdb not on PATH")
    val dir = java.nio.file.Files.createTempDirectory("graft_blastdb")
    val seq = "ATGGCTAGCTAGGTCGATCGATCGATTACGATCGGCTAGCTAGCATCGATCGTAGCTAGC" * 3
    java.nio.file.Files.writeString(dir.resolve("subject.fa"),
      s">subj Pseudomonas phage test\n$seq\n")
    val mk = new ProcessBuilder("makeblastdb",
      "-in", dir.resolve("subject.fa").toString,
      "-dbtype", "nucl", "-out", dir.resolve("db").toString).start()
    assert(mk.waitFor() == 0, "makeblastdb failed")

    val clusters = Seq(("g1", seq), ("g2", null.asInstanceOf[String]))
      .toDF("cluster_id", "reference_sequence").coalesce(1)
    // blastn reads the query from stdin by default — exactly the pipe contract
    val hits = BlastShell.runBlastXml(spark, clusters,
      Seq("blastn", "-db", dir.resolve("db").toString, "-outfmt", "5"))
    val got = hits.collect()
    assert(got.nonEmpty, "self-hit must be found")
    assert(got.forall(_.getString(0) == "g1"))
    assert(got.exists(_.getString(1).contains("phage")))

    val annotated = BlastShell.annotate(clusters, hits)
    assert(annotated.filter(col("cluster_id") === "g1").head()
      .getAs[Boolean]("hasBlastVirusHit"))
  }
}

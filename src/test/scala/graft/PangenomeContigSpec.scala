package graft

import graft.pangenome.Pangenome
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Multi-contig lifecycle golden (SURVEY §4): the positional model's one
  * structural bet is linearity — one NEIGHBOUR chain per genome. The
  * `minipan_contigs` fixture breaks it on purpose: strain S1 carries a
  * chromosome (contig1: gA, filler, integrase, gB) AND a plasmid
  * (contig2: transposase gP, replication gene gX), while S2-S4 are
  * single-contig with gA,gB,gX adjacent. Global coordinates follow the
  * reference's concatenated-genome model, so WITHOUT the `(Strain,
  * Contig)` chain key the plasmid would fuse onto the chromosome tail:
  * a spurious gB→gP NEIGHBOUR edge, GC smoothing bleeding across the
  * boundary, and — the planted trap — a "mobile RGP" between core
  * anchors gB…gX that actually spans two replicons.
  */
class PangenomeContigSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fixture = getClass.getResource("/minipan_contigs").getPath

  private lazy val etl = Pangenome.etl(spark, fixture)
  private lazy val graph = Pangenome.buildGraph(spark, etl)
  private lazy val enriched = Pangenome.enrich(spark, graph)

  override def afterAll(): Unit = spark.stop()

  test("ETL: NEIGHBOUR chains break at the contig boundary") {
    val e = etl.neighbourEdges.collect()
      .map(r => (r.getString(0), r.getString(1)))
    // S1: 3 chromosome edges + 1 plasmid edge (NOT 5); S2-S4: 2 each
    assert(e.length == 10, s"expected 10 edges, got: ${e.toSeq.sorted}")
    assert(!e.contains(("S1_004", "S1_005")),
      "chromosome tail must not chain onto the plasmid head")
    assert(e.contains(("S1_005", "S1_006")), "the plasmid is its own chain")
    // linearity per chain
    val outDeg = e.groupBy(_._1).view.mapValues(_.length)
    val inDeg = e.groupBy(_._2).view.mapValues(_.length)
    assert(outDeg.values.forall(_ == 1) && inDeg.values.forall(_ == 1))
  }

  test("graph: cluster NEIGHBOUR members reflect per-contig chains") {
    val edges = graph.clusterNeighbours.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getSeq[String](3))).toMap
    // gB->gX adjacency exists only in the single-contig strains: S1 has
    // both clusters but on different replicons
    assert(edges(("gB", "gX")) == (3L, Seq("S2", "S3", "S4")))
    // the plasmid chain contributes its own edge, members = [S1]
    assert(edges(("gP", "gX")) == (1L, Seq("S1")))
    assert(!edges.contains(("gB", "gP")),
      "no cluster edge may bridge the replicon boundary")
  }

  test("genome track: positions span the strain, windows reset per contig") {
    val track = Pangenome.genomeTrack(enriched, graph)
    val s1 = track.filter(col("Strain") === "S1").orderBy("position").collect()
    assert(s1.map(_.getAs[String]("Name")).toSeq ==
      Seq("S1_001", "S1_002", "S1_003", "S1_004", "S1_005", "S1_006"))
    assert(s1.map(_.getAs[Int]("position")).toSeq == (1 to 6))
    assert(s1.map(_.getAs[String]("Contig")).toSeq ==
      Seq.fill(4)("contig1") ++ Seq.fill(2)("contig2"))
    // smoothing must start fresh on the plasmid: position 5 is the first
    // feature of contig2, so its trailing-10 mean is its own z alone —
    // with a strain-wide window it would average positions 1-5
    val z = s1.map(_.getAs[Double]("z_GC"))
    val smooth = s1.map(_.getAs[Double]("smooth_GC"))
    assert(math.abs(smooth(4) - z(4)) < 1e-12,
      s"plasmid head must not inherit the chromosome window: ${smooth(4)} vs ${z(4)}")
    assert(math.abs(smooth(5) - (z(4) + z(5)) / 2) < 1e-12)
    // chromosome side unaffected: position 4 still averages 1-4
    assert(math.abs(smooth(3) - z.take(4).sum / 4) < 1e-12)
  }

  test("RGP miner finds the chromosome RGP and rejects the cross-contig trap") {
    val rgps = Pangenome.rgpMine(enriched, graph,
      coreFrac = 0.95, majorityFrac = 0.7, minEdges = 2, maxEdges = 10,
      requireMobile = true)
    val rows = rgps.collect()
    // the trap is LIVE: gB (pos 4, contig1) and gX (pos 6, contig2) are
    // an anchor pair (adjacent in S2-S4, both core) whose S1 position gap
    // sits inside the path bounds, and the intervening plasmid gene is a
    // transposase — only the same-contig guard keeps it out
    val track = Pangenome.genomeTrack(enriched, graph)
      .filter(col("Strain") === "S1").collect()
      .map(r => r.getAs[String]("Name") -> r.getAs[Int]("position")).toMap
    val gap = track("S1_006") - track("S1_004")
    assert(gap >= 2 && gap <= 10, s"trap gap $gap drifted out of the path bounds")
    assert(!rows.exists(r => r.getAs[String]("c2") == "gX" ||
      r.getAs[String]("c1") == "gX"),
      s"cross-contig span must not mine as an RGP: ${rows.toSeq}")
    // exactly the planted chromosome insertion survives
    assert(rows.length == 1, s"expected 1 RGP, got: ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[String]("Strain") == "S1" &&
      r.getAs[String]("c1") == "gA" && r.getAs[String]("c2") == "gB" &&
      r.getAs[Int]("pos1") == 1 && r.getAs[Int]("pos2") == 4)
    assert(r.getAs[collection.Seq[String]]("InsertionListClusterID").toSeq ==
      Seq("gF1", "gI"))
    assert(r.getAs[collection.Seq[String]]("InsertionListMobileNames").toSeq ==
      Seq("phage integrase"))
  }
}

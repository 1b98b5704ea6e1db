package graft

import graft.pangenome.Pangenome
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden test of the domain pipeline on the mini-pangenome
  * fixture (FIXTURES.md §1): ETL -> graph build -> enrichment -> analyses,
  * asserting the hand-computed goldens (FIXTURES.md §3) and the SURVEY §5
  * structural invariants.
  */
class PangenomeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fixture = getClass.getResource("/minipan").getPath

  private lazy val etl = Pangenome.etl(spark, fixture)
  private lazy val graph = Pangenome.buildGraph(spark, etl)
  private lazy val enriched = Pangenome.enrich(spark, graph)

  override def afterAll(): Unit = spark.stop()

  test("ETL: feature table shape and strain derivation") {
    val f = etl.features.collect()
    assert(f.length == 20)
    val byStrain = f.groupBy(_.getAs[String]("Strain")).view.mapValues(_.length).toMap
    assert(byStrain == Map("S1" -> 8, "S2" -> 6, "S3" -> 6))
  }

  test("ETL: variation strings match hand-computed deltas") {
    val v = etl.features.select("Name", "Variation").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v("S1_001") == "")      // identical to reference
    assert(v("S2_001") == "4T")    // single substitution at index 4
    assert(v("S3_001") == "3C2G")  // absolute first gap, relative second
    assert(v("S2_004") == "6-")    // gap character counts as a diff
    assert(v("S1_008") == null)    // lonely: no aligned sequence
    assert(v("S3_005") == null)    // cluster without fasta file
  }

  test("ETL: lonely + missing-cluster features get genome substrings") {
    val f = etl.features.filter(col("FullSequences").isNotNull)
      .select("Name", "FullSequences").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(f("S1_008") == "ATGTTTACCTGA")
    assert(f("S3_005") == "ATGCCCGGGTGA")
  }

  test("ETL: neighbour edges = sum(features per strain - 1), strain-local") {
    val e = etl.neighbourEdges.collect()
    assert(e.length == 17) // 7 + 5 + 5
    // chains are linear: each feature has <=1 incoming and <=1 outgoing edge
    val outDeg = e.groupBy(_.getAs[String]("sourceFeature")).view.mapValues(_.length)
    val inDeg = e.groupBy(_.getAs[String]("receivingFeature")).view.mapValues(_.length)
    assert(outDeg.values.forall(_ == 1) && inDeg.values.forall(_ == 1))
    // no cross-strain edge: prefixes match
    assert(e.forall(r => r.getString(0).take(2) == r.getString(1).take(2)))
  }

  test("graph: every feature has exactly one ORTHOLOG; multi-copy explodes") {
    val counts = graph.ortholog.groupBy("feature_id").count().collect()
    assert(counts.length == 20 && counts.forall(_.getLong(1) == 1))
    // g2 has 4 members (multi-copy (S3_002:S3_006) exploded)
    val g2 = graph.ortholog.filter(col("cluster_id") === "g2").count()
    assert(g2 == 4)
  }

  test("graph: lonely cluster created with feature's sequence, feature nulled") {
    val lc = graph.clusters.filter(col("lonely_cluster")).collect()
    assert(lc.length == 1)
    val row = lc.head
    assert(row.getAs[String]("cluster_id") == "S1_008")
    assert(row.getAs[String]("reference_sequence") == "ATGTTTACCTGA")
    val f = graph.features.filter(col("Name") === "S1_008")
      .select("FullSequences").head()
    assert(f.isNullAt(0))
  }

  test("graph: PIRATE average_length ingested, not aliased from min_length") {
    // fixture g2: min 12, max 12, average 13.7 (01_creatingDatabase.cypher:38)
    val g2 = graph.clusters.filter(col("cluster_id") === "g2")
      .select("min_length", "max_length", "average_length").head()
    assert(g2.getLong(0) == 12 && g2.getLong(1) == 12)
    assert(g2.getDouble(2) == 13.7)
  }

  test("graph: null reference sequence repaired from reference feature (J10)") {
    val g9 = graph.clusters.filter(col("cluster_id") === "g9")
      .select("reference_sequence").head()
    assert(g9.getString(0) == "ATGCCCGGGTGA")
  }

  test("graph: cluster feature_type uses CDS > tRNA > pseudogene priority") {
    val types = graph.clusters.select("cluster_id", "feature_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types("g6") == "tRNA")
    assert(types("g9") == "pseudogene")
    assert(types("g1") == "CDS")
  }

  test("graph: cluster neighbour contraction accumulates members") {
    val edges = graph.clusterNeighbours.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getSeq[String](3))).toMap
    assert(edges.size == 12)
    assert(edges(("g1", "g2")) == (3L, Seq("S1", "S2", "S3")))
    assert(edges(("g3", "g4")) == (3L, Seq("S1", "S2", "S3")))
    assert(edges(("g7", "g3")) == (2L, Seq("S1", "S2")))
    assert(edges(("g9", "g2")) == (1L, Seq("S3")))
  }

  test("graph: strain nodes unique, cluster-in-strain deduped 2-hop") {
    assert(graph.strains.count() == 3)
    // g2 is in S3 once despite two copies
    val g2s3 = graph.clusterInStrain
      .filter(col("cluster_id") === "g2" && col("strain") === "S3").count()
    assert(g2s3 == 1)
    assert(graph.clusterInStrain.count() ==
      graph.clusterInStrain.distinct().count())
  }

  test("rgpMine plan construction is lazy: zero Spark jobs until an action") {
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    // force the lazy fixtures first so their jobs don't count
    enriched.features.queryExecution.analyzed
    spark.sparkContext.addSparkListener(listener)
    try {
      val plan = Pangenome.rgpMine(enriched, graph,
        majorityFrac = 0.3, minEdges = 2, maxEdges = 10, requireMobile = false)
      plan.queryExecution.analyzed // build + analyze, no action
      Thread.sleep(500)            // let any async listener events drain
      assert(jobs == 0, s"building the rgpMine plan launched $jobs Spark jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("enrichment: GC/CAI match hand-computed goldens; tRNA skipped") {
    val m = enriched.features.select("Name", "GC", "CAI").collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    // S1_001 = ATGGCAGCTTGA: GC 50%, CAI = 0.586^1 (GCA,GCT counted, /1)
    assert(m("S1_001")._1.contains(50.0))
    assert(math.abs(m("S1_001")._2.get.asInstanceOf[Double] -
      math.exp(math.log(0.586) / 1.0)) < 1e-12)
    // S2_001 decoded = ATGGTAGCTTGA -> CAI exp((ln .495 + ln 1)/1) = 0.495
    assert(math.abs(m("S2_001")._2.get.asInstanceOf[Double] - 0.495) < 1e-12)
    // tRNA/pseudogene features: no metrics (CDS-only pass)
    assert(m("S1_004")._1.isEmpty && m("S3_005")._1.isEmpty)
    // gapped member decodes to 11nt: biopython on the RAW sequence hits the
    // trailing partial codon -> raise -> NaN (the reference's filteredSeq
    // is dead code, extendingDB_FeatureAndStrainMetrics.py:54-68) — but GC
    // is still computed from the same decoded sequence
    assert(m("S2_004")._2.isEmpty)
    assert(m("S2_004")._1.nonEmpty)
  }

  test("genome track: positions, z-scores and flags are computed per strain") {
    val track = Pangenome.genomeTrack(enriched, graph)
    val s1 = track.filter(col("Strain") === "S1").orderBy("position").collect()
    assert(s1.map(_.getAs[String]("Name")).toSeq ==
      Seq("S1_001", "S1_002", "S1_003", "S1_004", "S1_005", "S1_006", "S1_007", "S1_008"))
    assert(s1.map(_.getAs[Int]("position")).toSeq == (1 to 8))
    // rare flag: all fixture clusters have number_genomes <= 3 <= 600
    assert(track.filter(col("rare_flag") === 0).count() == 0)
  }

  test("RGP miner finds the planted insertions with correct spans") {
    val rgps = Pangenome.rgpMine(enriched, graph,
      coreFrac = 0.95, majorityFrac = 0.3, minEdges = 2, maxEdges = 10,
      requireMobile = false)
    val rows = rgps.collect().map { r =>
      (r.getAs[String]("Strain"), r.getAs[String]("c1"), r.getAs[String]("c2"),
        r.getAs[Int]("pos1"), r.getAs[Int]("pos2")) ->
        (r.getAs[Long]("InsertionNbFeatures"),
          r.getAs[Seq[String]]("InsertionListClusterID"),
          r.getAs[Seq[String]]("InsertionListMobileNames"),
          r.getAs[Long]("n_tRNA"))
    }.toMap
    assert(rows.size == 4)
    // I1: S1 g2@2 -> g3@6, intervening g5(integrase), g6(tRNA), g7
    assert(rows(("S1", "g2", "g3", 2, 6)) ==
      (3L, Seq("g5", "g6", "g7"), Seq("phage integrase"), 1L))
    // I2: S2 g2@2 -> g3@5, intervening g8(transposase), g7
    assert(rows(("S2", "g2", "g3", 2, 5)) ==
      (2L, Seq("g8", "g7"), Seq("IS5 transposase"), 0L))
    // I3: S3 multi-copy anchor g1@1 -> g2@6 (second copy)
    assert(rows(("S3", "g1", "g2", 1, 6)) ==
      (4L, Seq("g2", "g3", "g4", "g9"), Seq(), 0L))
    // I4: S3 g3@3 -> g2@6
    assert(rows(("S3", "g3", "g2", 3, 6)) ==
      (2L, Seq("g4", "g9"), Seq(), 0L))
  }

  test("RGP miner: mobile-gene predicate filters to the two mobile insertions") {
    val rgps = Pangenome.rgpMine(enriched, graph,
      coreFrac = 0.95, majorityFrac = 0.3, minEdges = 2, maxEdges = 10,
      requireMobile = true)
    assert(rgps.select("Strain").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("S1", "S2"))
    // Welch t present for the GC list (>=2 non-null values)
    val withT = rgps.filter(col("t_GC").isNotNull).count()
    assert(withT == 2)
  }

  test("insertion clustering merges the one close pair at cutoff 0.6") {
    val rgps = Pangenome.rgpMine(enriched, graph,
      coreFrac = 0.95, majorityFrac = 0.3, minEdges = 2, maxEdges = 10,
      requireMobile = false)
    // jaccard distances: I1{g5,g6,g7}-I2{g8,g7} = 0.75, I3{g2,g3,g4,g9}-
    // I4{g4,g9} = 0.5, all others 1.0 -> only I3,I4 merge at cutoff 0.6
    val labels = Pangenome.insertionClusters(rgps, cutoff = 0.6).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labels.size == 4)
    assert(labels("S3|1|6") == labels("S3|3|6"))
    assert(labels.values.toSet.size == 3)
  }

  test("anchor-group phylo spread matches hand-computed tree distances") {
    // fixture tree (S1:1,(S2:2,S3:3):1): d(S1,S2)=4, d(S1,S3)=5, d(S2,S3)=5
    val treeStr = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixture/binary_presence_absence.nwk")))
    val dists = Map(("S1", "S2") -> 4.0, ("S1", "S3") -> 5.0, ("S2", "S3") -> 5.0)
    val rgps = Pangenome.rgpMine(enriched, graph,
      coreFrac = 0.95, majorityFrac = 0.3, minEdges = 2, maxEdges = 10,
      requireMobile = false)
    val phylo = Pangenome.anchorPhylo(rgps, treeStr).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // expected per anchor pair, from the span strain sets + the hand table
    val strainSets = rgps.select("c1", "c2", "Strain").distinct().collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.map(_.getString(2)).sorted.toSeq).toMap
    val multi = strainSets.filter(_._2.size >= 2)
    assert(multi.nonEmpty, "fixture must yield at least one multi-strain anchor group")
    assert(phylo.keySet == multi.keySet) // single-strain groups dropped
    multi.foreach { case (k, ss) =>
      val ds = for { i <- ss.indices; j <- i + 1 until ss.size }
        yield dists((ss(i), ss(j)))
      val (n, mn, mean, mx) = phylo(k)
      assert(n == ds.size && mn == ds.min && mx == ds.max)
      assert(math.abs(mean - ds.sum / ds.size) < 1e-12)
    }
  }

  test("insertion Dice similarity matches hand computation") {
    val rgps = Pangenome.rgpMine(enriched, graph,
      coreFrac = 0.95, majorityFrac = 0.3, minEdges = 2, maxEdges = 10,
      requireMobile = false)
    val dice = Pangenome.insertionDice(rgps).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // I1 {g5,g6,g7} vs I2 {g8,g7}: 2*1/(3+2) = 0.4
    assert(math.abs(dice.getOrElse(("S1|2|6", "S2|2|5"),
      dice(("S2|2|5", "S1|2|6"))) - 0.4) < 1e-12)
    // I3 {g2,g3,g4,g9} vs I4 {g4,g9}: 2*2/(4+2) = 2.0/3
    assert(math.abs(dice.getOrElse(("S3|1|6", "S3|3|6"),
      dice(("S3|3|6", "S3|1|6"))) - 2.0 / 3) < 1e-12)
  }
}

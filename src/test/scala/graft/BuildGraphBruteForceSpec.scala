package graft

import graft.pangenome.Pangenome
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force property test for the graph-build job — the reference's
  * 1,805 s centerpiece (`01_creatingDatabase.cypher`). Random pangenomes
  * with lonely features, clusters lacking reference sequences, and mixed
  * feature types; every output table is compared against a naive
  * driver-side reconstruction: one ORTHOLOG per feature, lonely clusters
  * carrying the feature's sequence (feature nulled), ref-seq repair from
  * the reference feature, CDS>tRNA>pseudogene priority, neighbour
  * contraction with sorted member lists, deduped 2-hop cluster⋈strain.
  */
class BuildGraphBruteForceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** feature row: (name, start, product, ftype, strain, cluster,
    * lonely, fullSeq)
    */
  private type FRow = (String, Long, String, String, String, String,
    Boolean, Option[String])

  private def randomPangenome(seed: Int): (Seq[FRow], Map[String, Option[String]]) = {
    val rnd = new scala.util.Random(seed)
    val nStrains = 4 + rnd.nextInt(3)
    val nSlots = 15 + rnd.nextInt(10)
    // clusters without an aligned reference sequence: repair path
    val nullSeqSlots = (0 until nSlots).filter(_ => rnd.nextDouble() < 0.15).toSet
    val rows = Seq.newBuilder[FRow]
    for (s <- 0 until nStrains) {
      var pos = 0L
      var idx = 0
      for (slot <- 0 until nSlots) {
        if (rnd.nextDouble() < 0.75) {
          val ftype = rnd.nextInt(10) match {
            case 0 => "tRNA"
            case 1 => "pseudogene"
            case _ => "CDS"
          }
          val lonely = rnd.nextDouble() < 0.06
          // members of a no-refseq cluster, and lonely features, carry
          // their genome substring (the ETL's J5+P6 path)
          val fullSeq =
            if (lonely || nullSeqSlots(slot))
              Some("ACGT" * (2 + (slot + s) % 3))
            else None
          rows += ((f"S${s}%02d_$idx%03d", pos * 10 + 1, "prod",
            ftype, f"S$s%02d", f"g$slot%03d", lonely, fullSeq))
          pos += 1; idx += 1
        }
      }
    }
    val all = rows.result()
    val clusterSeq: Map[String, Option[String]] =
      all.groupBy(_._6).map { case (c, _) =>
        val slot = c.drop(1).toInt
        c -> (if (nullSeqSlots(slot)) None else Some("GCT" * (2 + slot % 3)))
      }
    (all, clusterSeq)
  }

  private def build(rows: Seq[FRow], clusterSeq: Map[String, Option[String]]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val features = rows.map { r =>
      (r._1, r._2, r._2 + 8, 9L, "+", r._3, r._5, r._4,
        if (r._7 || r._8.nonEmpty) None else Some(""), r._8)
    }.toDF("Name", "Start", "End", "Length", "Strand", "Product", "Strain",
      "FeatureType", "Variation", "FullSequences")
    val clusters = rows.filter(!_._7).groupBy(_._6).map { case (c, members) =>
      (c, "desc", 50L, members.map(_._5).distinct.size.toLong, 9L, 9L, 9.0,
        members.map(_._1).sorted.mkString(";"),
        members.map(_._1).min, clusterSeq(c).orNull)
    }.toSeq.toDF("allele_name", "consensus_product", "threshold",
      "number_genomes", "min_length", "max_length", "average_length",
      "feature", "reference_locus", "Seq")
    val wOrd = Window.partitionBy(col("Strain")).orderBy(col("Start"), col("Name"))
    val neighbourEdges = features
      .withColumn("sourceFeature", lag(col("Name"), 1).over(wOrd))
      .filter(col("sourceFeature").isNotNull)
      .select(col("sourceFeature"), col("Name").as("receivingFeature"),
        col("Strain").as("strain"))
    Pangenome.buildGraph(spark, Pangenome.EtlTables(features, clusters, neighbourEdges))
  }

  for (seed <- Seq(3, 17, 71)) {
    test(s"buildGraph equals the naive reconstruction on seed $seed") {
      val (rows, clusterSeq) = randomPangenome(seed)
      val g = build(rows, clusterSeq)
      val byName = rows.map(r => r._1 -> r).toMap
      val lonelyNames = rows.filter(_._7).map(_._1).toSet

      // ORTHOLOG: every feature exactly once; lonely -> own cluster
      val ortho = g.ortholog.collect()
        .map(r => r.getAs[String]("feature_id") -> r.getAs[String]("cluster_id"))
      assert(ortho.length == rows.size)
      ortho.foreach { case (f, c) =>
        val r = byName(f)
        assert(c == (if (r._7) f else r._6), s"feature $f")
      }

      // lonely clusters: own id, the feature's sequence moved over,
      // feature's FullSequences nulled
      val lc = g.clusters.filter(org.apache.spark.sql.functions.col("lonely_cluster"))
        .collect().map(r => r.getAs[String]("cluster_id") ->
          r.getAs[String]("reference_sequence")).toMap
      assert(lc.keySet == lonelyNames)
      lonelyNames.foreach(n => assert(lc(n) == byName(n)._8.get, s"lonely $n"))
      val nulled = g.features
        .filter(org.apache.spark.sql.functions.col("Name").isin(lonelyNames.toSeq: _*))
        .collect().map(r => r.getAs[String]("Name") -> (r.getAs[String]("FullSequences") == null))
      nulled.foreach { case (n, isNull) => assert(isNull, s"lonely feature $n not nulled") }

      // ref-seq repair: null Seq clusters take the reference feature's
      // genome substring
      val realClusters = g.clusters
        .filter(!org.apache.spark.sql.functions.col("lonely_cluster"))
        .collect().map(r => r.getAs[String]("cluster_id") ->
          (r.getAs[String]("reference_sequence"), r.getAs[String]("feature_type"))).toMap
      val prio = Map("CDS" -> 3, "tRNA" -> 2, "pseudogene" -> 1)
      rows.filter(!_._7).groupBy(_._6).foreach { case (c, members) =>
        val (gotSeq, gotType) = realClusters(c)
        val refLocus = members.map(_._1).min
        val wantSeq = clusterSeq(c).getOrElse(byName(refLocus)._8.orNull)
        assert(gotSeq == wantSeq, s"cluster $c ref seq")
        val wantType = members.map(m => prio(m._4)).max match {
          case 3 => "CDS"; case 2 => "tRNA"; case 1 => "pseudogene"
        }
        assert(gotType == wantType, s"cluster $c feature_type")
      }

      // cluster NEIGHBOUR contraction: weights + sorted strain members
      val want = scala.collection.mutable.Map.empty[(String, String), List[String]]
      rows.groupBy(_._5).foreach { case (_, fs) =>
        fs.sortBy(r => (r._2, r._1)).sliding(2).foreach {
          case Seq(a, b) =>
            val ca = if (a._7) a._1 else a._6
            val cb = if (b._7) b._1 else b._6
            want((ca, cb)) = a._5 :: want.getOrElse((ca, cb), Nil)
          case _ => ()
        }
      }
      val gotEdges = g.clusterNeighbours.collect().map(r =>
        (r.getAs[String]("c1"), r.getAs[String]("c2")) ->
          ((r.getAs[Long]("number_of_members"), r.getAs[Seq[String]]("members")))).toMap
      assert(gotEdges.keySet == want.keySet)
      want.foreach { case (k, strains) =>
        assert(gotEdges(k) == ((strains.size.toLong, strains.sorted)), s"edge $k")
      }

      // deduped 2-hop cluster-in-strain
      val wantCis = rows.map(r => (if (r._7) r._1 else r._6, r._5)).toSet
      val gotCis = g.clusterInStrain.collect()
        .map(r => (r.getAs[String]("cluster_id"), r.getAs[String]("strain")))
      assert(gotCis.length == gotCis.distinct.length)
      assert(gotCis.toSet == wantCis)
    }
  }
}

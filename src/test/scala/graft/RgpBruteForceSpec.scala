package graft

import graft.pangenome.Pangenome
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force property test for the RGP miner — SURVEY §7's "what's
  * hard" #1: Cypher's `-[:NEIGHBOUR*min..max]->` counts EDGES, includes
  * both anchors in `nodes(path)`, and enumerates every (f1, f2)
  * occurrence pair per strain — including multi-copy anchors. The four
  * PangenomeSpec goldens pin planted cases; this spec checks the full
  * structural output (spans, multiplicity, ordered lists, mobile
  * predicate, tRNA counts) against a naive in-memory reference on random
  * pangenomes with duplicated clusters and random dropout.
  */
class RgpBruteForceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val coreFrac = 0.5
  private val majorityFrac = 0.3
  private val minEdges = 2
  private val maxEdges = 8

  /** One random pangenome: per strain an ordered walk over cluster slots
    * with dropout and within-strain DUPLICATE copies (multi-copy anchors).
    * Returns (features rows, cluster membership) — features as
    * (name, start, product, ftype, strain, cluster).
    */
  private def randomPangenome(seed: Int, nStrains: Int, nSlots: Int)
      : Seq[(String, Long, String, String, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val rows = Seq.newBuilder[(String, Long, String, String, String, String)]
    for (s <- 0 until nStrains) {
      var pos = 0L
      var idx = 0
      for (slot <- 0 until nSlots) {
        val copies =
          if (rnd.nextDouble() >= 0.7) 0
          else if (rnd.nextDouble() < 0.12) 2
          else 1
        for (_ <- 0 until copies) {
          val product =
            if (rnd.nextDouble() < 0.10) "phage integrase"
            else if (rnd.nextDouble() < 0.05) "IS5 transposase"
            else "hypothetical protein"
          val ftype = if (rnd.nextDouble() < 0.08) "tRNA" else "CDS"
          rows += ((f"S${s}%02d_$idx%03d", pos * 10 + 1, product, ftype,
            f"S$s%02d", f"g$slot%03d"))
          pos += 1; idx += 1
        }
      }
    }
    rows.result()
  }

  /** Naive driver-side reference mirroring rgpMine's documented
    * semantics: directed consecutive-pair weights, undirected anchor
    * match with directed nb_out, core via distinct-strain counts, every
    * (occurrence, occurrence) span within [minEdges, maxEdges], body
    * strictly between, lists ordered by position.
    */
  private def naive(rows: Seq[(String, Long, String, String, String, String)])
      : Set[(String, String, String, String, String, Long, Long, Long,
             Seq[String], Seq[String], Long, Boolean)] = {
    val byStrain = rows.groupBy(_._5).view.mapValues(
      _.sortBy(r => (r._2, r._1))).toMap
    val nStrains = byStrain.size
    // directed consecutive-cluster weights + outgoing totals
    val w = scala.collection.mutable.Map.empty[(String, String), Long]
    byStrain.values.foreach { fs =>
      fs.sliding(2).foreach {
        case Seq(a, b) => w((a._6, b._6)) = w.getOrElse((a._6, b._6), 0L) + 1
        case _ => ()
      }
    }
    val nbOut = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val genomes = rows.groupBy(_._6).view.mapValues(_.map(_._5).distinct.size).toMap
    val core = genomes.collect {
      case (c, ng) if ng > coreFrac * nStrains => c
    }.toSet
    // anchor pairs: either orientation's dir weight, against c1's nb_out
    val anchors = (for {
      ((a, b), wt) <- w.iterator
      (c1, c2) <- Iterator((a, b), (b, a))
      if c1 != c2 && core(c1) && core(c2)
      if wt > nbOut.getOrElse(c1, 0L) * majorityFrac
    } yield (c1, c2)).toSet
    // spans: every occurrence pair within bounds, per strain
    val out = Set.newBuilder[(String, String, String, String, String, Long,
      Long, Long, Seq[String], Seq[String], Long, Boolean)]
    for ((strain, fs) <- byStrain) {
      val positioned = fs.zipWithIndex.map { case (r, i) => (r, i + 1L) }
      for {
        (c1, c2) <- anchors
        (f1, p1) <- positioned if f1._6 == c1
        (f2, p2) <- positioned if f2._6 == c2
        if p2 - p1 >= minEdges && p2 - p1 <= maxEdges
      } {
        val body = positioned.filter { case (_, p) => p > p1 && p < p2 }
        if (body.nonEmpty) {
          val mobile = body.map(_._1._3)
            .filter(p => p.contains("integrase") || p.contains("transposase"))
            .sorted
          out += ((strain, c1, c2, f1._1, f2._1, p1, p2, p2 - p1 - 1,
            body.map(_._1._6), mobile,
            body.count(_._1._4 == "tRNA").toLong, mobile.nonEmpty))
        }
      }
    }
    out.result()
  }

  private def sparkRgps(rows: Seq[(String, Long, String, String, String, String)])
      : Set[(String, String, String, String, String, Long, Long, Long,
             Seq[String], Seq[String], Long, Boolean)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val features = rows.toDF("Name", "Start", "Product", "FeatureType",
        "Strain", "cluster")
      .withColumn("End", col("Start") + 8)
      .withColumn("Length", lit(9L))
      .withColumn("Strand", lit("+"))
      .withColumn("Variation", lit(""))
      .withColumn("FullSequences", lit(null).cast("string"))
    val clusters = rows.groupBy(_._6).map { case (c, members) =>
      // per-cluster reference DNA varies with the slot so GC differs
      // across clusters (a constant would make every variance zero);
      // one cluster in ~12 keeps the all-same-GC degenerate case alive
      // to exercise the zero-pooled-variance NaN guard
      val k = c.drop(1).toInt
      val ref = if (k % 12 == 0) "GCTGCTGCT"
        else "GCT" * (1 + k % 3) + "AAT" * (1 + k % 4)
      (c, "hypothetical protein", 50L, members.map(_._5).distinct.size.toLong,
        9L, 9L, 9.0, members.map(_._1).sorted.mkString(";"),
        members.map(_._1).min, ref)
    }.toSeq.toDF("allele_name", "consensus_product", "threshold",
      "number_genomes", "min_length", "max_length", "average_length",
      "feature", "reference_locus", "Seq")
    val wOrd = Window.partitionBy(col("Strain")).orderBy(col("Start"), col("Name"))
    val neighbourEdges = features
      .withColumn("sourceFeature", lag(col("Name"), 1).over(wOrd))
      .filter(col("sourceFeature").isNotNull)
      .select(col("sourceFeature"), col("Name").as("receivingFeature"),
        col("Strain").as("strain"))
    val etl = Pangenome.EtlTables(
      features.drop("cluster"), clusters, neighbourEdges)
    val g = Pangenome.buildGraph(spark, etl)
    val e = Pangenome.enrich(spark, g)
    Pangenome.rgpMine(e, g, coreFrac = coreFrac, majorityFrac = majorityFrac,
        minEdges = minEdges, maxEdges = maxEdges, requireMobile = false)
      .collect().map { r =>
        (r.getAs[String]("Strain"), r.getAs[String]("c1"), r.getAs[String]("c2"),
          r.getAs[String]("anchor1"), r.getAs[String]("anchor2"),
          r.getAs[Int]("pos1").toLong, r.getAs[Int]("pos2").toLong,
          r.getAs[Long]("InsertionNbFeatures"),
          r.getAs[Seq[String]]("InsertionListClusterID"),
          r.getAs[Seq[String]]("InsertionListMobileNames"),
          r.getAs[Long]("n_tRNA"), r.getAs[Boolean]("has_mobile"))
      }.toSet
  }

  for (seed <- Seq(11, 42, 99)) {
    test(s"rgpMine equals the naive span enumeration on seed $seed") {
      val rows = randomPangenome(seed, nStrains = 5, nSlots = 25)
      val want = naive(rows)
      val got = sparkRgps(rows)
      val missing = want -- got
      val extra = got -- want
      assert(missing.isEmpty && extra.isEmpty,
        s"seed=$seed missing=${missing.take(3)} extra=${extra.take(3)} " +
          s"(|want|=${want.size} |got|=${got.size})")
      assert(want.nonEmpty, s"seed $seed produced no spans — weak fixture")
    }
  }
}

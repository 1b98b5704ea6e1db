package graft

import graft.pangenome.{Pangenome, Schemas}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Matched-scale lifecycle rehearsal (VERDICT r4 "what's missing" #2):
  * synthesize a pangenome SHAPED like the reference's full dataset — 770
  * strains x ~5.8k features each ≈ 4.4M features, ~6.5k gene families of
  * ~750 members, ~1 kb reference sequences (`readme.md:1`,
  * `strains.txt:1-769`) — then run the composed
  * `etl -> buildGraph -> enrich -> genomeTrack + rgpMine` lifecycle once,
  * wall-clocked per stage, against BASELINE.md's Neo4j numbers
  * (graph build ≈ 1,805 s, enrichment ≈ 254 + 13.5 s).
  *
  * The generator is pure Spark (one `range` pass, hash-derived columns,
  * zero driver loops) and deterministic: presence/absence, island
  * structure, variation strings and reference DNA all come from
  * `xxhash64` of (strain, slot) — re-runs are bit-identical.
  *
  * Shape model: each strain's genome is a walk over 6,500 ordered cluster
  * "slots"; 100 islands of 8 accessory slots sit between core spans
  * (present as a unit in ~20% of strains, carrying integrase/transposase
  * products), core slots drop out at 2% — so RGP mining finds genuine
  * majority-edge anchors with minority insertion spans, the reference's
  * cell-12 structure (5,078 candidate insertions at full scale).
  *
  * Usage: `sbt "runMain graft.Rehearsal [nStrains]"` (default 770; the
  * spec runs a miniature). Emits one JSON line with per-stage seconds and
  * writes rehearsal_out.json.
  */
object Rehearsal {

  /** EtlTables-shaped synthetic pangenome, built lazily (no jobs here).
    *
    * `hotFactor` > 1 plants a PATHOLOGICAL strain: strain 0's genome is
    * `hotFactor` concatenated copies of the 6,500-slot cycle (position-
    * indexed feature names keep every feature unique; family membership,
    * island structure, variation and lonely flags repeat per copy — the
    * paralog shape real mega-genomes/misassemblies produce). At
    * hotFactor = 86 over 770 strains, strain 0 holds 86/(86+769) ≈ 10%
    * of ALL features — the SkewSpec hot-key model at lifecycle scale,
    * stressing every per-Strain window (lag edges, genome track) and
    * per-Strain shuffle in the pipeline. hotFactor = 1 is bit-identical
    * to the uniform corpus.
    */
  def synthesize(spark: SparkSession, nStrains: Int, hotFactor: Int = 1): Pangenome.EtlTables = {
    require(hotFactor >= 1, s"hotFactor must be >= 1, got $hotFactor")
    val slotsPerStrain = 6500
    val hotSlots = slotsPerStrain.toLong * hotFactor
    val codons = graft.functions.Cai.SharpEcoliIndex.keys.toSeq.sorted
    val codArr = array(codons.map(lit): _*)

    def dna(salt: Column, nCod: Column) = concat(
      lit("ATG"),
      array_join(transform(sequence(lit(1), nCod),
        i => element_at(codArr,
          (pmod(xxhash64(salt, i), lit(codons.size)) + 1).cast("int"))), ""),
      lit("TGA"))

    // sid/pos: strain 0 occupies [0, hotSlots), the rest follow uniformly;
    // pos is the genome position (unique per strain), slot the gene-family
    // cycle index — identical for hotFactor = 1
    val base = spark.range(hotSlots + (nStrains - 1).toLong * slotsPerStrain)
      .select(
        when(col("id") < hotSlots, 0L)
          .otherwise(((col("id") - hotSlots) / slotsPerStrain).cast("long") + 1).as("sid"),
        when(col("id") < hotSlots, col("id"))
          .otherwise((col("id") - hotSlots) % slotsPerStrain).as("pos"))
      .withColumn("slot", col("pos") % slotsPerStrain)
      .withColumn("islot", col("slot") % 65)
      .withColumn("islandId", (col("slot") / 65).cast("long"))
      .withColumn("isAccessory", col("islot") >= 57)
      // islands toggle as a UNIT per (strain, island); core drops out at 2%
      .filter(
        when(col("isAccessory"), pmod(xxhash64(col("sid"), col("islandId")), lit(100)) < 20)
          .otherwise(pmod(xxhash64(col("sid"), col("slot")), lit(100)) < 98))
      .withColumn("nCodons", (lit(300) + pmod(xxhash64(col("slot")), lit(100))).cast("int"))
      .withColumn("h", xxhash64(lit(7), col("sid"), col("slot")))
      .withColumn("lonely", pmod(col("h"), lit(1000)) < 3)

    val features = base.select(
      format_string("S%03d_f%04d", col("sid"), col("pos")).as("Name"),
      (col("pos") * 1500 + 1).as("Start"),
      (col("pos") * 1500 + col("nCodons") * 3 + 6).as("End"),
      (col("nCodons") * 3 + 6).cast("long").as("Length"),
      when(pmod(col("h"), lit(2)) === 0, "+").otherwise("-").as("Strand"),
      when(col("isAccessory") && col("islot") === 58, "phage integrase")
        .when(col("isAccessory") && col("islot") === 61, "IS5 transposase")
        .otherwise("hypothetical protein").as("Product"),
      format_string("S%03d", col("sid")).as("Strain"),
      when(col("islot") === 13, "tRNA")
        .when(col("islot") === 37, "pseudogene")
        .otherwise("CDS").as("FeatureType"),
      when(col("lonely"), lit(null).cast("string"))
        .when(pmod(col("h"), lit(4)) === 0,
          format_string("%dT", pmod(col("h"), lit(200)) + 1))
        .otherwise(lit("")).as("Variation"),
      when(col("lonely"), dna(concat(col("sid"), lit("_"), col("slot")), col("nCodons")))
        .otherwise(lit(null).cast("string")).as("FullSequences"))

    // gene-family table in the PIRATE shape buildGraph expects: the member
    // list is the ';'-joined id string the reference's cypher UNWINDs
    val slotSeqs = spark.range(slotsPerStrain.toLong)
      .select(col("id").as("slot"))
      .withColumn("nCodons", (lit(300) + pmod(xxhash64(col("slot")), lit(100))).cast("int"))
      .withColumn("Seq", dna(col("slot"), col("nCodons")))
      .select(col("slot"), col("Seq"))
    val clusters = base.filter(!col("lonely"))
      .select(col("slot"),
        format_string("S%03d", col("sid")).as("Strain"),
        format_string("S%03d_f%04d", col("sid"), col("pos")).as("Name"),
        (col("nCodons") * 3 + 6).cast("long").as("Length"))
      .groupBy(col("slot"))
      // count the strain COLUMN, not a fixed-width Name prefix: above 999
      // strains the prefix collides and number_genomes silently undercounts
      // (found as n_rgps=0 at the 1540-strain scaling run)
      .agg(countDistinct(col("Strain")).as("number_genomes"),
        min(col("Length")).as("min_length"), max(col("Length")).as("max_length"),
        avg(col("Length")).as("average_length"),
        concat_ws(";", sort_array(collect_list(col("Name")))).as("feature"),
        min(col("Name")).as("reference_locus"))
      .join(slotSeqs, Seq("slot"))
      .select(format_string("g%04d", col("slot")).as("allele_name"),
        lit("hypothetical protein").as("consensus_product"),
        lit(50L).as("threshold"), col("number_genomes"),
        col("min_length"), col("max_length"), col("average_length"),
        col("feature"), col("reference_locus"), col("Seq"))

    // consecutive features per strain in genome order (the etl's own form)
    val w = Window.partitionBy(col("Strain")).orderBy(col("Start"), col("Name"))
    val neighbourEdges = features
      .withColumn("sourceFeature", lag(col("Name"), 1).over(w))
      .filter(col("sourceFeature").isNotNull)
      .select(col("sourceFeature"), col("Name").as("receivingFeature"),
        col("Strain").as("strain"))

    Pangenome.EtlTables(features, clusters, neighbourEdges)
  }

  /** Run the lifecycle against `dir`; returns (stage -> seconds, rgp rows,
    * analysis stats). The stats block mirrors BASELINE.md's notebook-golden
    * table (RGPs.ipynb cells 12/25/35/38/54/67/89-91) so each round's
    * rehearsal reports the same cardinalities the reference recorded at
    * full scale — in ratio form against the synthetic shape, since the
    * real 770-genome dataset is not in the sandbox.
    */
  def run(spark: SparkSession, nStrains: Int, dir: String, hotFactor: Int = 1)
      : (Seq[(String, Double)], Long, Seq[(String, String)]) = {
    val timings = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def stage[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      timings += name -> (System.nanoTime() - t0) / 1e9
      r
    }

    // ETL-equivalent: materialize the source tables (the reference's CSV
    // load step); downstream stages read from disk like the real boundary
    stage("etl_materialize") {
      val t = synthesize(spark, nStrains, hotFactor)
      t.features.repartition(col("Strain"))
        .write.mode("overwrite").parquet(s"$dir/etl/features")
      t.clusters.write.mode("overwrite").parquet(s"$dir/etl/clusters")
      t.neighbourEdges.repartition(col("strain"))
        .write.mode("overwrite").parquet(s"$dir/etl/neighbour_edges")
    }
    val etl = Pangenome.EtlTables(
      spark.read.parquet(s"$dir/etl/features"),
      spark.read.parquet(s"$dir/etl/clusters"),
      spark.read.parquet(s"$dir/etl/neighbour_edges"))

    // BASELINE graph build ≈ 1,805 s at this shape
    stage("build_graph") {
      Schemas.writeGraph(Pangenome.buildGraph(spark, etl), s"$dir/graph")
    }
    val g = Schemas.readGraph(spark, s"$dir/graph")

    // BASELINE enrichment ≈ 254 s (GC/CAI upsert) + 13.5 s (strain stats)
    stage("enrich") {
      val e = Pangenome.enrich(spark, g)
      e.features.repartition(col("Strain"))
        .write.mode("overwrite").parquet(s"$dir/enriched/features")
      e.strains.write.mode("overwrite").parquet(s"$dir/enriched/strains")
    }
    val e = Pangenome.EnrichedTables(
      spark.read.parquet(s"$dir/enriched/features"),
      spark.read.parquet(s"$dir/enriched/strains"))

    stage("genome_track") {
      Pangenome.genomeTrack(e, g).write.format("noop").mode("overwrite").save()
    }
    stage("rgp_mine") {
      Pangenome.rgpMine(e, g).write.mode("overwrite").parquet(s"$dir/rgps")
    }
    val rgps = spark.read.parquet(s"$dir/rgps")
    val nRgps = rgps.count()

    // the downstream analysis lifecycle (RGPs.ipynb cells 44-93) through
    // the library's designated SCALE branches: LSH candidate generation
    // (ids-only banding) for the Dice pairs, LSH graph + GraphX connected
    // components for the flat clustering, broadcast LCA index for the
    // phylo spread — maxExactRows/maxDriverN forced low so the rehearsal
    // exercises the paths a 100 TB run would take, not the small-N exacts
    // Analysis sinks are parquet since r6 (was noop): the outputs are
    // small (pairs above the Dice floor, one label per insertion, one row
    // per anchor group) and materializing them lets the untimed stats
    // block below read them back instead of recomputing the whole stage.
    stage("insertion_dice") {
      Pangenome.insertionDice(rgps, minDice = 0.5, maxExactRows = 5000)
        .write.mode("overwrite").parquet(s"$dir/dice")
    }
    stage("insertion_clusters") {
      Pangenome.insertionClusters(rgps, cutoff = 0.3, maxDriverN = 5000)
        .write.mode("overwrite").parquet(s"$dir/clusters")
    }
    stage("anchor_phylo") {
      Pangenome.anchorPhylo(rgps, balancedNewick(nStrains))
        .write.mode("overwrite").parquet(s"$dir/phylo")
    }

    // UNTIMED: the notebook-golden cardinalities (BASELINE.md correctness
    // table). Cheap driver-side aggregates over the already-materialized
    // stage outputs; all values land in rehearsal_out.json so NOTES can
    // diff them round-over-round alongside the stage times.
    val stats = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    // cells 35/37-38: strains with >=1 insertion; max insertions per strain
    val perStrain = rgps.groupBy(col("Strain")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("strains"), max(col("n")).as("mx")).head()
    stats += "strains_with_insertion" -> perStrain.getLong(0).toString
    stats += "max_insertions_per_strain" -> perStrain.getLong(1).toString
    // cell 25: GC/CAI t-test significance cross-tab at p < 0.05
    val sig = rgps.agg(
      sum(when(col("p_GC") < 0.05 && col("p_CAI") < 0.05, 1).otherwise(0)),
      sum(when(col("p_GC") < 0.05 && !(col("p_CAI") < 0.05), 1).otherwise(0)),
      sum(when(!(col("p_GC") < 0.05) && col("p_CAI") < 0.05, 1).otherwise(0)),
      sum(when(col("p_GC").isNull || col("p_CAI").isNull, 1).otherwise(0))).head()
    stats += "sig_both" -> sig.getLong(0).toString
    stats += "sig_gc_only" -> sig.getLong(1).toString
    stats += "sig_cai_only" -> sig.getLong(2).toString
    stats += "sig_nan" -> sig.getLong(3).toString
    // cells 70-84: Dice pair structure above the 0.5 floor
    stats += "n_dice_pairs" -> spark.read.parquet(s"$dir/dice").count().toString
    // cells 89-91: flat clusters @ jaccard-distance 0.3 — count, largest,
    // size spread (np.std in cell 91 is the POPULATION std-dev)
    val cl = spark.read.parquet(s"$dir/clusters")
      .groupBy(col("label")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)), max(col("sz")), stddev_pop(col("sz"))).head()
    stats += "n_flat_clusters" -> cl.getLong(0).toString
    stats += "max_cluster_size" -> cl.getLong(1).toString
    stats += "stddev_cluster_size" -> fmt(cl.getDouble(2))
    // cells 54/67: per-anchor-group phylo spread; the most-spread group
    val ph = spark.read.parquet(s"$dir/phylo")
    val phTop = ph.orderBy(col("max_distance").desc, col("c1"), col("c2"))
      .select(col("n_distances"), col("min_distance"),
        col("mean_distance"), col("max_distance"))
      .limit(1).collect()
    stats += "n_anchor_groups" -> ph.count().toString
    phTop.headOption.foreach { r =>
      stats += "top_group_n_pairs" -> r.getLong(0).toString
      stats += "top_group_min_dist" -> fmt(r.getDouble(1))
      stats += "top_group_mean_dist" -> fmt(r.getDouble(2))
      stats += "top_group_max_dist" -> fmt(r.getDouble(3))
    }
    (timings.toSeq, nRgps, stats.toSeq)
  }

  /** Balanced binary Newick over S000..S(n-1), unit branch lengths —
    * the rehearsal's stand-in for the reference's core-genome tree.
    */
  def balancedNewick(n: Int): String = {
    def go(lo: Int, hi: Int): String =
      if (hi - lo == 1) f"S$lo%03d"
      else { val mid = (lo + hi) / 2; s"(${go(lo, mid)}:1,${go(mid, hi)}:1)" }
    go(0, n) + ";"
  }

  def main(args: Array[String]): Unit = {
    val nStrains = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_REHEARSAL_STRAINS")).getOrElse("770").toInt
    // second arg / env: hot-strain factor (strain 0 gets hotFactor×6500
    // features — 86 ≈ 10% of the corpus on one strain at 770 strains)
    val hotFactor = args.drop(1).headOption
      .orElse(sys.env.get("SPARK_GRAFT_REHEARSAL_HOT")).getOrElse("1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional: route the lifecycle's per-strain windows through the Skew
    // two-phase plans (bit-identical output, SkewLifecycleSpec) — lets a
    // hot-factor run exercise the mitigation at matched scale
    sys.env.get("SPARK_GRAFT_SKEW_TRACK")
      .foreach(v => spark.conf.set("graft.skew.trackChunkSpan", v))
    sys.env.get("SPARK_GRAFT_SKEW_CHAIN")
      .foreach(v => spark.conf.set("graft.skew.chainChunkSpan", v))
    val dir = java.nio.file.Files.createTempDirectory("graft_rehearsal").toString
    try {
      val (timings, nRgps, stats) = run(spark, nStrains, dir, hotFactor)
      val total = timings.map(_._2).sum
      def f(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
      val stages = timings.map { case (k, v) => s""""$k":${f(v)}""" }.mkString(",")
      // stats values are numeric strings built with Locale.ROOT — emit bare
      val analysis = stats.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      val line = s"""{"metric":"rehearsal_total","value":${f(total)},"unit":"sec",""" +
        s""""n_strains":$nStrains,"hot_factor":$hotFactor,"n_rgps":$nRgps,""" +
        s""""stages":{$stages},"analysis":{$analysis}}"""
      Raw.stdout.println(line)
      val out = if (hotFactor > 1) "rehearsal_out_hot.json" else "rehearsal_out.json"
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally {
      // scrub the scratch tables
      graft.operators.Scratch.deleteRecursively(new java.io.File(dir))
      spark.stop()
    }
  }
}

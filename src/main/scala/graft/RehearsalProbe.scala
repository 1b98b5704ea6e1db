package graft
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for the hot-strain rehearsal: A/B-times the
  * build_graph stage (uniform vs hotFactor corpus) INSIDE ONE JVM,
  * alternating reps, so JVM warmup / page-cache / boot variance cancels
  * — consecutive separate-JVM runs of the same stage were measured
  * differing 2x on this box, far above the skew signal.
  * `runMain graft.RehearsalProbe [nStrains] [hotFactor] [reps]`
  */
object RehearsalProbe {
  def main(args: Array[String]): Unit = {
    val nStrains = args.headOption.getOrElse("770").toInt
    val hotFactor = args.drop(1).headOption.getOrElse("86").toInt
    val reps = args.drop(2).headOption.getOrElse("2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_rprobe").toString
    try {
      // untimed prep: materialize BOTH etl variants
      for ((hf, tag) <- Seq(1 -> "u", hotFactor -> "h")) {
        val t = Rehearsal.synthesize(spark, nStrains, hf)
        t.features.repartition(col("Strain"))
          .write.mode("overwrite").parquet(s"$dir/$tag/etl/features")
        t.clusters.write.mode("overwrite").parquet(s"$dir/$tag/etl/clusters")
        t.neighbourEdges.repartition(col("strain"))
          .write.mode("overwrite").parquet(s"$dir/$tag/etl/neighbour_edges")
      }
      def etl(tag: String) = pangenome.Pangenome.EtlTables(
        spark.read.parquet(s"$dir/$tag/etl/features"),
        spark.read.parquet(s"$dir/$tag/etl/clusters"),
        spark.read.parquet(s"$dir/$tag/etl/neighbour_edges"))
      // alternating timed reps of the full build_graph stage (the
      // rehearsal's shape: buildGraph -> writeGraph to parquet)
      for (r <- 1 to reps; (tag, label) <- Seq("u" -> "uniform", "h" -> s"hot$hotFactor")) {
        time(s"build_graph/$label r$r") {
          pangenome.Schemas.writeGraph(
            pangenome.Pangenome.buildGraph(spark, etl(tag)), s"$dir/graph_$tag")
        }
      }
      // and the genome_track stage, same A/B shape (needs enrich first)
      for ((tag, label) <- Seq("u" -> "uniform", "h" -> s"hot$hotFactor")) {
        val g = pangenome.Schemas.readGraph(spark, s"$dir/graph_$tag")
        val e = pangenome.Pangenome.enrich(spark, g)
        e.features.repartition(col("Strain"))
          .write.mode("overwrite").parquet(s"$dir/$tag/enriched/features")
        e.strains.write.mode("overwrite").parquet(s"$dir/$tag/enriched/strains")
      }
      for (r <- 1 to reps; (tag, label) <- Seq("u" -> "uniform", "h" -> s"hot$hotFactor")) {
        val g = pangenome.Schemas.readGraph(spark, s"$dir/graph_$tag")
        val e = pangenome.Pangenome.EnrichedTables(
          spark.read.parquet(s"$dir/$tag/enriched/features"),
          spark.read.parquet(s"$dir/$tag/enriched/strains"))
        time(s"genome_track/$label r$r") {
          pangenome.Pangenome.genomeTrack(e, g)
            .write.format("noop").mode("overwrite").save()
        }
      }
    } finally operators.Scratch.deleteRecursively(new java.io.File(dir))
    spark.stop()
  }
}

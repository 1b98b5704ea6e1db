package graft
import graft.pangenome.Pangenome
import org.apache.spark.sql.SparkSession
object AuditDomain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fixture = "src/test/resources/minipan"
    val dir = java.nio.file.Files.createTempDirectory("audit_graph").toString
    val g0 = Pangenome.buildGraph(spark, Pangenome.etl(spark, fixture))
    graft.pangenome.Schemas.writeGraph(g0, dir)
    val g = graft.pangenome.Schemas.readGraph(spark, dir)
    val e0 = Pangenome.enrich(spark, g)
    // materialize enrichment too (the deployment shape)
    e0.features.write.mode("overwrite").parquet(s"$dir/efeatures")
    e0.strains.write.mode("overwrite").parquet(s"$dir/estrains")
    val e = Pangenome.EnrichedTables(
      spark.read.parquet(s"$dir/efeatures"), spark.read.parquet(s"$dir/estrains"))
    val track = Pangenome.genomeTrack(e, g)
    val rgps = Pangenome.rgpMine(e, g, majorityFrac = 0.3, minEdges = 2, maxEdges = 10, requireMobile = false)
    for ((n, df) <- Seq("genomeTrack" -> track, "rgpMine" -> rgps)) {
      val s = df.queryExecution.executedPlan.toString
      println(s"== $n: exchanges=${"Exchange".r.findAllIn(s).length} " +
        s"reused=${"ReusedExchange".r.findAllIn(s).length} " +
        s"broadcasts=${"BroadcastExchange".r.findAllIn(s).length} " +
        s"sorts=${"Sort ".r.findAllIn(s).length}")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: does each m-family query plan pick up the payload
  * frames persisted by `PipelineOps.prepareMultimodalPayloads`? Prints
  * the InMemoryTableScan count per query plan.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    operators.PipelineOps.prepareMultimodalPayloads(spark, d)
    for (q <- Seq("m2b_container_frames", "m3_decode_features",
        "m4_resize_thumbnail", "m5_audio_features")) {
      val df = SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val hits = "InMemoryTableScan".r.findAllIn(plan).length
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $q%-24s InMemoryTableScan=$hits ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r15): rep-level cache behavior of a named query —
  * the in-session shape Bench measures. For each query: N back-to-back
  * noop-sink runs in ONE session, printing per-rep seconds and how many
  * InMemoryTableScan nodes the rep's OWN plan resolved to (0 on a rep
  * that should re-read a SharedFrame persisted by rep 1 = the
  * plan-equality cache miss this probe exists to catch).
  * `runMain graft.RepProbe <sfDir> <reps> <q1,q2,...>`.
  */
object RepProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val qs = args.lift(2).map(_.split(',').toSeq).getOrElse(Seq("d15_bm25_topk"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- qs; r <- 1 to reps) {
      val df = SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val hits = "InMemoryTableScan".r.findAllIn(plan).length
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[rep] $q%-24s rep=$r InMemoryTableScan=$hits ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

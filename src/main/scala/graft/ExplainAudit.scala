package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- (if (args.nonEmpty) args.toSeq else Seq("s1_scan_project", "j1_broadcast_inner", "j8_star_join", "w2_rolling_sum_flag", "g7_bounded_spans", "g8_span_collect", "d5_cosine_topk", "d10_decontaminate", "x8_training_mix"))) {
      println(s"\n========== $q ==========")
      println(SparkEntry.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

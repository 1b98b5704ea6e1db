package graft

import org.apache.spark.sql.SparkSession

/** Plan-marker scan over every driver-contract query (scratchpad, like
  * TimeAudit): prints which physical plans contain the scale-sensitive
  * operators — cartesian products, broadcast nested-loop joins,
  * single-partition exchanges — and whether scans push filters. Ground
  * truth for PlanContractSpec's allowlists.
  * `runMain graft.PlanScan [sfDir]`.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val markers = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
      "SinglePartition", "PushedFilters: [I", "InMemoryTableScan")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val hits = markers.filter(plan.contains)
        if (hits.nonEmpty) println(s"[plan] $name -> ${hits.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"[plan] $name -> ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}

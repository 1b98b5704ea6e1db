package graft

import graft.operators.Bucketing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed layout must actually eliminate the join shuffle: same
  * join, zero Exchange nodes when both sides are bucketed on the key,
  * two when they are not.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // runtime conf: applies even when another suite's session won getOrCreate.
    // Forcing SMJ keeps the exchange counts meaningful (broadcast would hide them).
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_features")
    spark.sql("DROP TABLE IF EXISTS b_clusters")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.stop()
  }

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("bucketed-bucketed join plans with zero exchanges") {
    import spark.implicits._
    val features = (1L to 2000L).map(i => (i % 97, s"f$i", i * 3 % 100)).toDF("cluster_id", "fid", "len")
    val clusters = (0L until 97L).map(i => (i, s"c$i")).toDF("cluster_id", "cname")
    Bucketing.writeBucketed(features, "b_features", "cluster_id", 8)
    Bucketing.writeBucketed(clusters, "b_clusters", "cluster_id", 8)

    val joined = Bucketing.colocatedJoin(spark, "b_features", "b_clusters", "cluster_id")
    assert(exchanges(joined) == 0,
      joined.queryExecution.executedPlan.toString.linesIterator.take(12).mkString("\n"))
    // and it still computes the right answer
    assert(joined.count() == 2000)

    // control: the same join over unbucketed data shuffles both sides
    val plain = features.join(clusters, "cluster_id")
    assert(exchanges(plain) == 2)
    assert(plain.count() == 2000)
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    // scan-only queries default to non-bucketed reads (autoBucketedScan);
    // pin the bucketed scan so the pruning shows up in the plan
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = spark.table("b_features").filter(col("cluster_id") === 42L)
      assert(one.count() > 0)
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan.take(800))
    } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }
}

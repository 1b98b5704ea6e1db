package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the mechanism behind `TopK.ensureHashAggCapacity`: Spark's
  * ObjectHashAggregateExec falls back to SORT-BASED aggregation once a
  * task's hash map passes `spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold` distinct keys (default 128) — at which point the
  * bounded-heap TopK aggregator degenerates into a full sort of its input
  * (measured at the 30× retrieval crossover: ~31 GB of sort spill for a
  * stage whose real output is k rows per query). The teeth run first:
  * at the Spark default the fallback metric MUST fire on a >128-group
  * aggregation — if a future Spark version changes the mechanism, the
  * teeth test fails and the helper gets re-evaluated instead of
  * silently guarding against nothing.
  *
  * AQE is off in this session so the executed plan is a plain tree the
  * metric traversal can read without unwrapping query stages.
  */
class TopKFallbackSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val ConfKey =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  // 1000 groups x 50 rows: far past the 128-key default in both of the
  // two shuffle partitions, comfortably under the raised threshold
  private def topkAgg(): DataFrame = {
    val rows = spark.range(50000L)
      .select((col("id") % 1000).as("g"),
        (col("id") * 2654435761L % 997).cast("double").as("score"),
        col("id"))
    rows.groupBy(col("g"))
      .agg(graft.functions.TopK.udaf(5)(col("score"), col("id")).as("top"))
  }

  /** Sum of the sort-fallback-task metric over every ObjectHashAggregate
    * in the executed plan (partial + final), after running the frame.
    */
  private def fallbackTasks(df: DataFrame): Long = {
    // collect(), not a noop write: a write wraps the plan in its own
    // QueryExecution, leaving THIS df's plan (and its metrics) unexecuted
    df.collect(): Unit
    val aggs = df.queryExecution.executedPlan.collect {
      case o: ObjectHashAggregateExec => o
    }
    assert(aggs.nonEmpty,
      "TopK must plan as ObjectHashAggregate — traversal found none:\n" +
        df.queryExecution.executedPlan)
    aggs.map(_.metrics("numTasksFallBacked").value).sum
  }

  test("teeth: at Spark's default threshold a >128-group TopK agg sort-falls-back") {
    spark.conf.unset(ConfKey)
    assert(fallbackTasks(topkAgg()) > 0,
      "expected the 128-key default to trigger sort fallback — if this " +
        "stops firing, Spark changed the mechanism and " +
        "TopK.ensureHashAggCapacity needs re-evaluation")
  }

  test("ensureHashAggCapacity keeps the same aggregation fully hash-based") {
    spark.conf.unset(ConfKey)
    graft.functions.TopK.ensureHashAggCapacity(spark)
    assert(spark.conf.get(ConfKey) ==
      graft.functions.TopK.RaisedFallbackThreshold.toString)
    try assert(fallbackTasks(topkAgg()) == 0L,
      "raised threshold must keep the bounded-heap aggregation in the hash map")
    finally spark.conf.unset(ConfKey)
  }

  test("an explicit non-default session threshold is respected") {
    spark.conf.set(ConfKey, "4096")
    try {
      graft.functions.TopK.ensureHashAggCapacity(spark)
      assert(spark.conf.get(ConfKey) == "4096",
        "a deliberate session override must survive the helper")
    } finally spark.conf.unset(ConfKey)
  }

  test("hash-based and sort-fallback paths agree on the answer") {
    // the helper is a performance guard, not a semantics change: the
    // same aggregation run both ways returns identical top-k lists
    spark.conf.unset(ConfKey)
    val viaFallback = topkAgg().orderBy(col("g")).collect()
    graft.functions.TopK.ensureHashAggCapacity(spark)
    val viaHash =
      try topkAgg().orderBy(col("g")).collect()
      finally spark.conf.unset(ConfKey)
    assert(viaFallback.sameElements(viaHash))
  }
}

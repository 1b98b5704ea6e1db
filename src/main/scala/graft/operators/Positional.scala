package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The session-shared positional frame over `events` — ONE window pass
  * computes both the genome-order index (`pos`) and the lag edge (`prev`)
  * (same partition key, same ordering, so Catalyst fuses them into a
  * single Window operator above a single exchange+sort).
  *
  * Spark does not deduplicate identical subplans inside one query, so
  * every consumer that re-derived this window paid the events
  * scan+shuffle+sort again — inside one query (g7's two anchor sides +
  * g8/g9's span body = 3×) and across queries. The frame is persisted
  * LAZILY: plan construction runs zero Spark jobs (the de-eager
  * contract), the first action populates the cache once, and Spark's
  * CacheManager dedupes by canonicalized plan, so every consumer —
  * x2/x3's anchor pipeline and the whole g6-g10 span family — shares ONE
  * entry instead of stacking copies. MEMORY_AND_DISK: an evicted block
  * degrades to recompute, never OOM. (A one-shot 100 TB ETL would
  * checkpoint this boundary to scratch parquet instead — see
  * [[graft.operators.Scratch]] — but these are interactive analysis
  * entries where the session-cache form is the idiomatic one.)
  *
  * Consumers that need a running aggregate over the chain order must
  * window by `pos` (the rank under (ts, event_id)), not by the dropped
  * timestamp columns — see g10.
  */
object Positional {

  private def wOrd =
    Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  def frame(s: SparkSession, d: String): DataFrame =
    SharedFrame(
      T.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          col("value"))
        .withColumn("pos", row_number().over(wOrd))
        .withColumn("prev", lag(col("event_type"), 1).over(wOrd))
        // prev_id serves the G1 edge derivation from the same cached
        // pass (three functions, one window spec -> ONE Window operator);
        // +16 B/row buys the whole g1-g5 neighbour family cache reuse
        .withColumn("prev_id", lag(col("event_id"), 1).over(wOrd))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("pos"), col("prev"), col("prev_id")),
      "positional", d)

  /** Per-user genome as ORDERED arrays (pos i at array index i) — the G6
    * walk model shared by the g8/g9 span projections and x2's RGP body.
    * The span theta-join form this replaced fanned every span out to its
    * intervening ROWS (2.47M rows for g8, ~1M for x2 on the round-7
    * testdata) and then re-shuffled them for the per-span aggregate; here
    * the chain collects ONCE per user (same user_id shuffle the
    * positional frame already has), spans join co-partitioned on user_id,
    * and the per-span work is a map-side `slice` of the ordered array —
    * no second shuffle, no row fan-out. Array size = chain length (the
    * reference domain's ~6.5k features/genome ≈ 100s of KB/row), the
    * same memory model G6 already commits to.
    */
  def userSeq(s: SparkSession, d: String): DataFrame =
    SharedFrame(
      frame(s, d)
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("event_type"),
          col("value")))).as("sq"))
        .select(col("user_id"),
          transform(col("sq"), x => x.getField("event_type")).as("seqT"),
          transform(col("sq"), x => x.getField("value")).as("seqV")),
      "user_seq", d)
}

package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Exact._

/** SURVEY §2.10 — batch-semantics views of the streaming surface. The same
  * window definitions run under Structured Streaming in
  * [[graft.streaming.StreamingJobs]] (watermarks + state); these entries
  * pin the *answers* against the DuckDB oracle, which streaming-mode runs
  * must converge to (exactly-once + complete windows ⇒ same result).
  */
object StreamingOps {

  val defs: Seq[QueryDef] = Seq(

    // ST1: tumbling event-time window aggregate (streaming analogue of the
    // W1-W3 trailing windows; window() ≡ time_bucket).
    QueryDef(
      "st1_tumbling_window",
      (s, d) =>
        T.events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), esum(col("value")).as("sum_value"))
          .select(col("window.start").as("win_start"), col("event_type"),
            col("n"), col("sum_value"))
          .orderBy(col("win_start"), col("event_type")),
      Some(s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
              |  event_type, count(*) AS n, ${sqlSum("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin),
      doc = "SURVEY §2.10; streaming tumbling window (StreamingJobs.tumblingCounts)"),

    // ST2: sliding window (1h / 30m) — every event lands in exactly two
    // windows; the oracle enumerates both bucket starts per event.
    QueryDef(
      "st2_sliding_window",
      (s, d) =>
        T.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("win_start"), col("n"))
          .orderBy(col("win_start")),
      Some("""WITH w AS (
             |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
             |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
             |    AS win_start
             |  FROM events)
             |SELECT win_start, count(*) AS n FROM w
             |GROUP BY win_start ORDER BY win_start""".stripMargin),
      doc = "SURVEY §2.10; streaming sliding window (StreamingJobs.slidingCounts)"),

    // ST3: sessionization — session boundary at >30min inactivity; session
    // id = running count of boundaries per user (the batch shape of
    // session windows; lag + cumulative sum, one shuffle on user).
    QueryDef(
      "st3_sessionize",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        T.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("new_session")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |m AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN prev_ts IS NULL
             |         OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
             |  FROM e),
             |sid AS (
             |  SELECT user_id, ts,
             |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM m)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(ts) AS session_start, max(ts) AS session_end
             |FROM sid GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin),
      doc = "SURVEY §2.10; session windows as lag+cumsum"),

    // ST4: streaming dedup — first event per (user, type) key. The batch
    // view is deterministic (first by event time, event_id tiebreak); the
    // streaming counterpart is dropDuplicates under a watermark
    // (StreamingJobs.dedupFirstArrival), which converges to this answer
    // when arrival order follows event time. This is the streaming face of
    // the pipeline's exact-dedup surface (d1).
    QueryDef(
      "st4_stream_dedup",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        T.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT user_id, event_type, event_id, ts FROM (
             |  SELECT user_id, event_type, event_id, ts,
             |    row_number() OVER (PARTITION BY user_id, event_type
             |      ORDER BY ts, event_id) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),
      doc = "SURVEY §2.10 + dedup list; streaming dropDuplicates batch view")
  )
}

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
      doc = "SURVEY §2.10 + dedup list; streaming dropDuplicates batch view"),

    // ST5: windowed HDR quantile card — the sketch family running
    // INSIDE the streaming surface: HDR buckets are additive counters
    // (d22/x16's carrier, one shared derivation in
    // StreamingJobs.hdrCellsOf), so a watermarked window aggregate IS
    // the sketch — per hour, ≤ 16 cells per octave cross the wire no
    // matter how many events the window saw, and a monitoring read
    // answers p50/p95 event value from cell geometry alone. This batch
    // view pins the cell fold + quantile answers against the oracle;
    // StreamingSpec proves the watermarked stream emits the identical
    // cells (additive ⇒ batch/stream convergence is structural, not
    // eventual). Values quantize to integer milli (the d5 rule), so
    // every column is integer and oracle-exact.
    QueryDef(
      "st5_window_hdr_card",
      (s, d) => {
        val cells = graft.streaming.StreamingJobs.hdrCellsOf(T.events(s, d))
        cells.groupBy(col("win_start"))
          .agg(sort_array(collect_list(struct(col("e"), col("m"), col("lo"),
            col("cnt")))).as("hist"),
            sum(col("cnt")).as("nq"))
          .select(col("win_start"), col("nq").as("n"),
            Hdr.quantileLo(500L, "p50_lo"), Hdr.quantileLo(950L, "p95_lo"))
          .orderBy(col("win_start"))
      },
      Some("""WITH ev AS (
             |  SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
             |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
             |  FROM events
             |  WHERE CAST(floor(value * 1000 + 0.5) AS BIGINT) >= 1),
             |bk AS (
             |  SELECT win_start, v, CAST(length(bin(v)) - 1 AS BIGINT) AS e,
             |    CAST(1 AS BIGINT) << CAST(length(bin(v)) - 1 AS INT) AS pw
             |  FROM ev),
             |hist AS (
             |  SELECT win_start, e, m, pw, CAST(count(*) AS BIGINT) AS cnt,
             |    pw + (m * pw + 15) // 16 AS lo
             |  FROM (SELECT win_start, e, pw, ((v - pw) * 16) // pw AS m FROM bk)
             |  GROUP BY win_start, e, m, pw),
             |nq AS (SELECT win_start, CAST(sum(cnt) AS BIGINT) AS n
             |       FROM hist GROUP BY win_start),
             |cum AS (
             |  SELECT win_start, e, m, lo,
             |    sum(cnt) OVER (PARTITION BY win_start ORDER BY e, m) AS cum
             |  FROM hist),
             |quant AS (
             |  SELECT q.win_start, q.q_milli, c.lo,
             |    row_number() OVER (PARTITION BY q.win_start, q.q_milli
             |      ORDER BY c.e, c.m) AS rn
             |  FROM (SELECT win_start, n, unnest([500, 950]) AS q_milli FROM nq) q
             |  JOIN cum c ON c.win_start = q.win_start
             |    AND c.cum >= (q.q_milli * q.n + 999) // 1000)
             |SELECT n.win_start, n.n,
             |  CAST(max(CASE WHEN q_milli = 500 THEN lo END) AS BIGINT) AS p50_lo,
             |  CAST(max(CASE WHEN q_milli = 950 THEN lo END) AS BIGINT) AS p95_lo
             |FROM nq n JOIN quant q ON q.win_start = n.win_start AND q.rn = 1
             |GROUP BY n.win_start, n.n ORDER BY n.win_start""".stripMargin),
      doc = "SURVEY §2.10 + sketch family; windowed HDR quantile card — additive bucket cells under a watermark (StreamingJobs.streamingHdrCells), p50/p95 event value from cell geometry, integer-exact")
  )
}

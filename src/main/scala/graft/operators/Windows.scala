package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.6 — the pandas trailing rolling windows over genome order
  * (GIsInStrain.ipynb cell 8) as Spark window frames. All frames are
  * rowsBetween trailing, matching pandas rolling(n) inclusive semantics.
  * Partitioning by the sequence key (strain/user) means each genome's
  * window computation is shuffle-local — one exchange, then linear scans.
  */
object Windows {

  private def w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
  // the same order by the cached rank — w1-w3 window the shared
  // positional frame exchange- and sort-free on a warm cache
  private def wp = Window.partitionBy(col("user_id")).orderBy(col("pos"))

  val defs: Seq[QueryDef] = Seq(

    // W2: rolling sum over a 0/1 flag + threshold -> genomic-island flag
    // (deviating.rolling(20).sum() > 5, GIsInStrain.ipynb cell 8).
    QueryDef(
      "w2_rolling_sum_flag",
      (s, d) =>
        Positional.frame(s, d)
          .withColumn("flag", (col("value") > 75).cast("int"))
          .withColumn("roll20",
            sum(col("flag")).over(wp.rowsBetween(-19, 0)))
          .withColumn("island", (col("roll20") > 5).cast("int"))
          .select(col("event_id"), col("user_id"), col("roll20"), col("island"))
          .orderBy(col("user_id"), col("event_id")),
      Some("""SELECT event_id, user_id,
             |  CAST(sum(CAST(value > 75 AS INT)) OVER win AS BIGINT) AS roll20,
             |  CAST(sum(CAST(value > 75 AS INT)) OVER win > 5 AS INT) AS island
             |FROM events
             |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin),
      doc = "SURVEY W2; GIsInStrain.ipynb:160,168 cell 8"),

    // W3: rolling max + threshold -> rare-region flag
    // (number_genomes.rolling(5).max() <= 600, GIsInStrain.ipynb cell 8).
    QueryDef(
      "w3_rolling_max_flag",
      (s, d) =>
        Positional.frame(s, d)
          .withColumn("roll_max", max(col("value")).over(wp.rowsBetween(-4, 0)))
          .withColumn("rare", (col("roll_max") <= 60).cast("int"))
          .select(col("event_id"), col("user_id"), col("roll_max"), col("rare"))
          .orderBy(col("user_id"), col("event_id")),
      Some("""SELECT event_id, user_id,
             |  max(value) OVER win AS roll_max,
             |  CAST(max(value) OVER win <= 60 AS INT) AS rare
             |FROM events
             |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin),
      doc = "SURVEY W3; GIsInStrain.ipynb:176 cell 8"),

    // W6: time-range trailing window (count + exact sum over the last 10
    // minutes per user) via the SKEW-SAFE chunked plan — Skew.rangeRolling
    // chunks the time axis into 40-minute spans, carries each chunk's
    // trailing 10 minutes into the next, and windows per (user, chunk), so
    // a pathological user spreads over span/W tasks instead of serializing
    // into one (SkewSpec pins plain-window equality and the scatter; the
    // plain plan is w1-w3's). The oracle is the PLAIN range window — the
    // whole point is bit-identical results from a skew-immune plan: long
    // sums and counts are exact, so regrouping cannot move a ulp.
    QueryDef(
      "w6_skew_rolling",
      (s, d) => {
        val tenMinUs = 600000000L // 10 min in epoch micros
        Skew.rangeRolling(
          T.events(s, d).withColumn("ord", unix_micros(col("ts"))),
          keys = Seq("user_id"), ordCol = col("ord"), window = tenMinUs)(w =>
          Seq(
            "roll_cnt" -> count(col("value")).over(w),
            "roll_sum" -> (sum(floor(col("value") * lit(1e6) + lit(0.5))
              .cast("long")).over(w).cast("double") / lit(1e6))))
          .select(col("event_id"), col("user_id"), col("roll_cnt"), col("roll_sum"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |  count(value) OVER win AS roll_cnt,
             |  CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) OVER win AS DOUBLE)
             |    / 1e6 AS roll_sum
             |FROM events
             |WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |               RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin),
      doc = "SURVEY W1-family at 100 TB posture; skew-safe chunked range window (Skew.rangeRolling)"),

    // W7: trailing ROWS window (w2's 20-row frame) via the SKEW-SAFE
    // two-phase plan — Skew.rowsRolling derives global per-user row
    // numbers with a value-chunk prefix sum (no per-user window ever
    // sees more than one 2-day chunk of a user), then replays the w6
    // carry trick on the contiguous row-number axis. The sparse corpus
    // (~1 event / 10.7 h per user vs a 2-day chunkSpan) makes every
    // 19-row frame span MANY value chunks — the exact case where w6's
    // adjacent-chunk carry would be wrong and the prefix-sum phase is
    // load-bearing. The oracle is the PLAIN rows window: bit-identical
    // results from a skew-immune plan (count/max are exact; (ts,
    // event_id) totally orders each user's rows).
    QueryDef(
      "w7_skew_rows_rolling",
      (s, d) => {
        val twoDaysUs = 172800000000L
        Skew.rowsRolling(
          T.events(s, d).withColumn("ord", unix_micros(col("ts"))),
          keys = Seq("user_id"), ordCol = col("ord"),
          tieCols = Seq(col("event_id")),
          window = 19, chunkSpan = twoDaysUs)(w =>
          Seq(
            "roll_cnt" -> count(col("value")).over(w),
            "roll_max" -> max(col("value")).over(w)))
          .select(col("event_id"), col("user_id"), col("roll_cnt"), col("roll_max"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |  count(value) OVER win AS roll_cnt,
             |  max(value) OVER win AS roll_max
             |FROM events
             |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin),
      doc = "SURVEY W1-W3 family at 100 TB posture; skew-safe two-phase rows window (Skew.rowsRolling)"),

    // W8: per-key POSITION (w5's row_number) via the distributed
    // prefix-sum — Skew.globalRowNumber, the two-phase plans' phase 1 on
    // its own: local row_number per (user, 2-day chunk), one count row
    // per chunk, exclusive running sum over the tiny count frame, join
    // back. No task ever holds a whole user's history; the oracle is the
    // PLAIN row_number — bit-identical numbering from a skew-immune plan.
    QueryDef(
      "w8_skew_position",
      (s, d) =>
        Skew.globalRowNumber(
          T.events(s, d).withColumn("ord", unix_micros(col("ts"))),
          keys = Seq("user_id"), ordCol = col("ord"),
          tieCols = Seq(col("event_id")),
          chunkSpan = 172800000000L, out = "position")
          .select(col("event_id"), col("user_id"), col("position"))
          .orderBy(col("user_id"), col("event_id")),
      Some("""SELECT event_id, user_id,
             |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |       AS BIGINT) AS position
             |FROM events ORDER BY user_id, event_id""".stripMargin),
      doc = "SURVEY W5 at 100 TB posture; distributed per-key position (Skew.globalRowNumber)")
  )
}

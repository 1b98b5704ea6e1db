package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HDR-histogram bucket arithmetic — ONE definition shared by d22
  * (corpus quantile sketch), x16 (per-shard card) and st5 (streaming
  * windowed card), per the Utf8Decode lesson: a numeric rule duplicated
  * across operators drifts silently.
  *
  * Geometry (HdrHistogram; same relative-error contract as DDSketch,
  * Masson et al. VLDB 2019): octave e = bit-length(v) − 1, 16 linear
  * sub-buckets per octave, all INTEGER arithmetic (bin()/shiftleft/div)
  * so Spark and DuckDB compute identical bucket ids — no log_γ floating
  * point anywhere. Buckets are additive counters: order- and
  * merge-order-independent, map-side combinable, streaming-native.
  */
object Hdr {

  /** Appends integer bucket columns (e, pw, m) for a non-negative long
    * column `v`. TOTAL: v = 0 rows land in the sentinel cell
    * (e = -1, pw = 1, m = 0) instead of forcing callers to union a
    * filtered branch (a second scan of the same grain — the x16
    * lesson); quantile packers exclude sentinels with `e >= 0`.
    */
  def withBuckets(df: DataFrame): DataFrame = df
    .withColumn("e", expr(
      "IF(v >= 1, CAST(length(bin(v)) - 1 AS BIGINT), CAST(-1 AS BIGINT))"))
    .withColumn("pw", expr(
      "IF(v >= 1, shiftleft(CAST(1 AS BIGINT), CAST(e AS INT)), CAST(1 AS BIGINT))"))
    .withColumn("m", expr(
      "IF(v >= 1, ((v - pw) * 16) div pw, CAST(0 AS BIGINT))"))

  /** Bucket lower bound from (pw, m) — pure arithmetic, usable after the
    * (e, m, pw) groupBy.
    */
  def loExpr: Column = expr("pw + (m * pw + 15) div 16")

  /** Bucket upper bound, capped at the octave top. */
  def hiExpr: Column =
    expr("least(pw + ((m + 1) * pw + 15) div 16 - 1, 2 * pw - 1)")

  /** The rank rule shared by every quantile read: quantile q = smallest
    * value whose cumulative count reaches ceil(q·n / 1000), all integer.
    */
  def rankSql(qMilliExpr: String, nExpr: String): String =
    s"(($qMilliExpr * $nExpr) + 999) div 1000"

  /** est_lo quantile fold over a packed `hist` array column (structs
    * sorted by (e, m) carrying at least (lo, cnt)) with total count
    * `nq`: the lower bound of the first bucket whose cumulative count
    * reaches the rank. -1 when the histogram is empty.
    */
  def quantileLo(qMilli: Long, as: String): Column = {
    val rnk = rankSql(qMilli.toString, "nq")
    expr(
      s"""aggregate(hist,
         |  named_struct('cum', CAST(0 AS BIGINT), 'lo', CAST(-1 AS BIGINT)),
         |  (a, b) -> IF(a.lo >= 0, a, named_struct(
         |    'cum', a.cum + b.cnt,
         |    'lo', IF(a.cum + b.cnt >= $rnk, b.lo, CAST(-1 AS BIGINT))))).lo""".stripMargin)
      .as(as)
  }

  /** The (lo, hi) variant of the same fold — hist structs must also
    * carry hi, and the rank comes from a pre-computed column (d22 takes
    * q_milli from a row, not a literal). Same first-bucket rule, same
    * -1 sentinels on an empty histogram.
    */
  def quantileSel(rankCol: String): Column = expr(
    s"""aggregate(hist,
       |  named_struct('cum', CAST(0 AS BIGINT),
       |               'lo', CAST(-1 AS BIGINT), 'hi', CAST(-1 AS BIGINT)),
       |  (a, b) -> IF(a.lo >= 0, a, named_struct(
       |    'cum', a.cum + b.cnt,
       |    'lo', IF(a.cum + b.cnt >= $rankCol, b.lo, CAST(-1 AS BIGINT)),
       |    'hi', IF(a.cum + b.cnt >= $rankCol, b.hi, CAST(-1 AS BIGINT)))))""".stripMargin)
}

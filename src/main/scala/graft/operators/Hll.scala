package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HyperLogLog register arithmetic (Flajolet et al. 2007) — ONE
  * definition shared by d17 (per-lang cardinality), x16 (per-shard data
  * card) and the rehearsal's data_card stage, per the Hdr/Utf8Decode
  * rule: a numeric rule duplicated across operators drifts silently.
  *
  * Geometry: a 60-bit hash h splits into bucket j = h mod 64 and rank
  * ρ = 55 − bit-length(h div 64) (55 when the remainder is zero); the
  * harmonic sum is kept EXACT as Σ 2^(54−M_j) in int64 (`scale` = 2^54:
  * 64 empty registers sum to 1.15e18 < 2^63; ranks above 54 floor to
  * 0), so the only double is the final α·m²·2^54/S both engines
  * evaluate from identical integers.
  */
object Hll {

  /** 2^54 — the harmonic-sum fixed-point scale. */
  val scale: Long = 18014398509481984L

  /** Register bucket j from a 60-bit hash column h. */
  def jExpr(h: String = "h"): Column = expr(s"$h % 64")

  /** Rank ρ from a 60-bit hash column h (integer-exact bit-length). */
  def rhoExpr(h: String = "h"): Column = expr(
    s"CASE WHEN $h div 64 = 0 THEN CAST(55 AS BIGINT) " +
      s"ELSE 55 - CAST(length(bin($h div 64)) AS BIGINT) END")

  /** One register's harmonic-sum term 2^(54−reg), 0 above 54. */
  def termExpr(reg: String = "reg"): Column = expr(
    s"CASE WHEN $reg <= 54 THEN shiftleft(CAST(1 AS BIGINT), CAST(54 - $reg AS INT)) " +
      "ELSE CAST(0 AS BIGINT) END")

  /** The m=64 raw estimator α·m²·2^54 / s_scaled, evaluated from exact
    * integers (0.709 · 4096 · 2^54 / S).
    */
  def estExpr(sScaled: String = "s_scaled"): Column =
    expr(s"0.709 * 4096 * CAST($scale AS DOUBLE) / $sScaled")

  /** Densify absent registers arithmetically: a register missing from a
    * (key, j) aggregate has M_j = 0 and contributes exactly 2^54 —
    * s_scaled = (64 − n_present)·2^54 + s_present, no grid join needed.
    */
  def sScaledFromPresent(nPresent: String = "n_present",
      sPresent: String = "s_present"): Column =
    expr(s"(64 - $nPresent) * CAST($scale AS BIGINT) + $sPresent")
}

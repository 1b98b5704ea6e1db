package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity arithmetic.
  *
  * Two engines disagree on double aggregates for two reasons: (1) summation
  * order (partial aggregation vs sequential) perturbs the last ulps; (2) any
  * double->decimal cast is engine-defined (Spark rounds the shortest decimal
  * string representation, others round the binary expansion), so even "exact"
  * decimal sums can diverge.
  *
  * The only engine-independent route is to quantize each value with pure IEEE
  * arithmetic — floor(x*f + 0.5) uses operations with bit-defined results on
  * every engine — sum the resulting exact integers, and do all derived math in
  * straight-line double arithmetic. Quantization error is bounded by 1/f and
  * identical everywhere, which is what an oracle compare needs.
  *
  * At 100 TB this is one multiply+floor per row inside the same whole-stage
  * codegen span — no extra shuffle, no extra pass.
  */
object Exact {

  /** Default fixed-point scale: 1e6 (values up to ~4e9 stay exact in double). */
  val F: Double = 1e6
  /** Smaller scale used where values get squared (keeps q*q within decimal 38). */
  val F2: Double = 1e4

  private def q(c: Column, f: Double): Column =
    floor(c * lit(f) + lit(0.5)).cast("long")

  /** Deterministic sum of a double column (quantized at 1e-6). */
  def esum(c: Column): Column =
    sum(q(c, F).cast("decimal(38,0)")).cast("double") / lit(F)

  /** Deterministic mean. */
  def eavg(c: Column): Column = esum(c) / count(c)

  /** Deterministic sample stddev via quantized power sums:
    * sqrt((Σx² − (Σx)²/n) / (n−1)); null when n < 2 (matches stddev_samp).
    */
  def estddev(c: Column): Column = {
    val qc = q(c, F2).cast("decimal(19,0)")
    val n  = count(c).cast("double")
    val s  = sum(qc).cast("double") / lit(F2)
    val s2 = sum(qc * qc).cast("double") / lit(F2 * F2)
    when(n < 2, lit(null).cast("double"))
      .otherwise(sqrt(greatest((s2 - s * s / n) / (n - lit(1.0)), lit(0.0))))
  }

  // ---- DuckDB fragments for the same arithmetic -------------------------
  // duckdb sum(BIGINT) yields HUGEINT; the final CAST AS DOUBLE normalizes.

  def sqlQ(x: String, f: String = "1e6"): String =
    s"CAST(floor(($x) * $f + 0.5) AS BIGINT)"

  def sqlSum(x: String): String =
    s"(CAST(sum(${sqlQ(x)}) AS DOUBLE) / 1e6)"

  def sqlAvg(x: String): String = s"(${sqlSum(x)} / count($x))"

  def sqlStddev(x: String): String = {
    val s  = s"(CAST(sum(${sqlQ(x, "1e4")}) AS DOUBLE) / 1e4)"
    val s2 = s"(CAST(sum(CAST(${sqlQ(x, "1e4")} AS HUGEINT) * ${sqlQ(x, "1e4")}) AS DOUBLE) / 1e8)"
    val n  = s"CAST(count($x) AS DOUBLE)"
    s"(CASE WHEN count($x) < 2 THEN NULL ELSE sqrt(greatest(($s2 - $s * $s / $n) / ($n - 1.0), 0.0)) END)"
  }
}

package graft.functions

/** Statistics kernels for the RGP significance pass (SURVEY A17):
  * Welch t from grouped moments + two-sided p-value via the Student-t CDF
  * (`ttest_ind_from_stats`, RGPs.ipynb:1033-1069 cells 19-20).
  *
  * The regularized incomplete beta is the standard Lentz continued-fraction
  * evaluation (public-domain algorithm, e.g. NIST DLMF 8.17 / Numerical
  * Recipes form) — deterministic double arithmetic, safe to run inside
  * executors as a scalar UDF.
  */
object Stats {

  /** Welch t statistic from per-group (mean, sd, n). */
  def welchT(m1: Double, sd1: Double, n1: Double, m2: Double, sd2: Double, n2: Double): Double =
    (m1 - m2) / math.sqrt(sd1 * sd1 / n1 + sd2 * sd2 / n2)

  /** Welch–Satterthwaite degrees of freedom. */
  def welchDf(sd1: Double, n1: Double, sd2: Double, n2: Double): Double = {
    val a = sd1 * sd1 / n1
    val b = sd2 * sd2 / n2
    (a + b) * (a + b) / (a * a / (n1 - 1) + b * b / (n2 - 1))
  }

  /** ln Γ(x) — Lanczos approximation (g=7, 9 coefficients, public). */
  def logGamma(x: Double): Double = {
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    else {
      val z = x - 1.0
      var s = c(0)
      var i = 1
      while (i < 9) { s += c(i) / (z + i); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(s)
    }
  }

  /** Regularized incomplete beta I_x(a, b) via Lentz's continued fraction. */
  def regIncBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val lnFront = a * math.log(x) + b * math.log(1.0 - x) -
      logGamma(a) - logGamma(b) + logGamma(a + b)
    // use the symmetry relation for faster convergence
    if (x > (a + 1.0) / (a + b + 2.0))
      return 1.0 - regIncBeta(b, a, 1.0 - x)
    val eps = 1e-15
    val fpmin = 1e-300
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1.0)
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      // even step
      var aa = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      // odd step
      aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) m = 301 else m += 1
    }
    math.exp(lnFront) * h / a
  }

  /** Two-sided p-value of a Student-t statistic with `df` degrees of freedom:
    * p = I_{df/(df+t²)}(df/2, 1/2).
    */
  def tTwoSidedP(t: Double, df: Double): Double = {
    if (t.isNaN || df.isNaN || df <= 0) return Double.NaN
    val x = df / (df + t * t)
    regIncBeta(df / 2.0, 0.5, x)
  }

  /** Full Welch test from moments; (t, df, p), p = NaN when undefined —
    * mirrors the reference's StatisticsError → NaN handling.
    */
  def welchTest(m1: Double, sd1: Double, n1: Double,
                m2: Double, sd2: Double, n2: Double): (Double, Double, Double) = {
    if (n1 < 2 || n2 < 2) return (Double.NaN, Double.NaN, Double.NaN)
    val t = welchT(m1, sd1, n1, m2, sd2, n2)
    val df = welchDf(sd1, n1, sd2, n2)
    (t, df, tTwoSidedP(t, df))
  }
}

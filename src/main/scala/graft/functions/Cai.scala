package graft.functions

/** Codon Adaptation Index (Sharp & Li 1987) with Biopython-compatible
  * semantics, reproducing the reference's enrichment step
  * (extendingDB_FeatureAndStrainMetrics.py:45,54-68):
  *
  *  - weights: the published Sharp & Li E. coli reference index (the
  *    Biopython `SharpEcoliIndex` default the reference relies on);
  *  - ATG / TGG (single-codon amino acids) are excluded from the mean;
  *  - stop codons TGA/TAA/TAG are skipped; any other unknown codon makes
  *    the whole gene undefined (reference catches → NaN, we return None);
  *  - the mean divides by (count − 1) — a Biopython quirk the reference
  *    inherits, kept for output fidelity;
  *  - the reference builds a filteredSeq (N-codons dropped, trailing
  *    bases trimmed) but then calls cai_for_gene on the RAW sequence
  *    (extendingDB_FeatureAndStrainMetrics.py:54-68 — filteredSeq is dead
  *    code), so an N-containing or non-multiple-of-3 sequence raises and
  *    records NaN. We reproduce that: such sequences return None. The
  *    dead pre-filter is kept as [[preFilter]] for documentation only.
  */
object Cai {

  /** Sharp & Li (1987) E. coli codon adaptation weights, DNA alphabet. */
  val SharpEcoliIndex: Map[String, Double] = Map(
    "GCA" -> 0.586, "GCC" -> 0.122, "GCG" -> 0.424, "GCT" -> 1.0,
    "AGA" -> 0.004, "AGG" -> 0.002, "CGA" -> 0.004, "CGC" -> 0.356,
    "CGG" -> 0.004, "CGT" -> 1.0,
    "AAC" -> 1.0, "AAT" -> 0.051,
    "GAC" -> 1.0, "GAT" -> 0.434,
    "TGC" -> 1.0, "TGT" -> 0.5,
    "CAA" -> 0.124, "CAG" -> 1.0,
    "GAA" -> 1.0, "GAG" -> 0.259,
    "GGA" -> 0.010, "GGC" -> 0.724, "GGG" -> 0.019, "GGT" -> 1.0,
    "CAC" -> 1.0, "CAT" -> 0.291,
    "ATA" -> 0.003, "ATC" -> 1.0, "ATT" -> 0.185,
    "CTA" -> 0.007, "CTC" -> 0.037, "CTG" -> 1.0, "CTT" -> 0.042,
    "TTA" -> 0.020, "TTG" -> 0.020,
    "AAA" -> 1.0, "AAG" -> 0.253,
    "ATG" -> 1.0,
    "TTC" -> 1.0, "TTT" -> 0.296,
    "CCA" -> 0.135, "CCC" -> 0.012, "CCG" -> 1.0, "CCT" -> 0.070,
    "AGC" -> 0.410, "AGT" -> 0.085,
    "TCA" -> 0.077, "TCC" -> 0.744, "TCG" -> 0.017, "TCT" -> 1.0,
    "ACA" -> 0.076, "ACC" -> 1.0, "ACG" -> 0.099, "ACT" -> 0.965,
    "TGG" -> 1.0,
    "TAC" -> 1.0, "TAT" -> 0.239,
    "GTA" -> 0.495, "GTC" -> 0.066, "GTG" -> 0.221, "GTT" -> 1.0)

  private val Skipped = Set("ATG", "TGG")
  private val Stops   = Set("TGA", "TAA", "TAG")

  /** ln(w)·1e9 rounded to integers ONCE on the JVM and embedded as plain
    * integer literals in both the Spark expression and the DuckDB oracle —
    * neither engine evaluates a transcendental on the weights at runtime,
    * so the log-sum is an exact integer aggregate that is bit-identical
    * everywhere regardless of summation order (the `operators.Exact`
    * contract, applied to CAI's geometric mean). Quantization error is
    * ≤ 0.5e-9 per codon, ~1e-9 on the final CAI — bounded and identical
    * in both engines.
    */
  val LnqScale: Double = 1e9
  val Lnq: Seq[(String, Long)] = SharpEcoliIndex.toSeq.sortBy(_._1)
    .map { case (c, w) => c -> math.round(math.log(w) * LnqScale) }

  /** The ATG/TGG-excluded weighted-codon predicate + quantized-log lookup,
    * as ONE Spark SQL scalar over a DNA string column — the distributed
    * scale path for P10 (the scalar [[caiForGene]] stays for
    * record-at-a-time use; FunctionsSpec pins their equivalence):
    * split into codons with a higher-order transform (no shuffle, no UDF,
    * stays in whole-stage codegen), sum the embedded integer logs, apply
    * the Biopython (n−1) mean + NaN rules, and floor-quantize the exp to
    * 1e-9 so the one-ulp exp() difference between libm implementations
    * cannot surface (both engines quantize the same way).
    */
  def caiQuantizedSql(dna: String): String = {
    val m = Lnq.map { case (c, q) => s"'$c', ${q}L" }.mkString("map(", ", ", ")")
    // greatest(,1) keeps the sequence total on empty input (sequence(1,0,3)
    // raises; the length=0 CASE arm answers first, but subexpression
    // elimination may evaluate the codon array unconditionally): the empty
    // string yields one '' pseudo-codon, unreachable behind the CASE guard.
    val codons =
      s"transform(sequence(1, greatest(length($dna), 1), 3), i -> substring($dna, i, 3))"
    val good =
      s"filter($codons, c -> try_element_at($m, c) IS NOT NULL AND c NOT IN ('ATG', 'TGG'))"
    val bad =
      s"exists($codons, c -> try_element_at($m, c) IS NULL AND c NOT IN ('TGA', 'TAA', 'TAG'))"
    s"""CASE WHEN length($dna) = 0 THEN CAST(1.0 AS DOUBLE)
       |     WHEN $bad THEN CAST(NULL AS DOUBLE)
       |     WHEN size($good) = 0 THEN CAST(1.0 AS DOUBLE)
       |     WHEN size($good) = 1 THEN CAST(NULL AS DOUBLE)
       |     ELSE floor(exp((CAST(aggregate($good, 0L, (a, c) -> a + try_element_at($m, c)) AS DOUBLE) / 1e9)
       |            / (size($good) - 1)) * 1e9 + 0.5) / 1e9
       |END""".stripMargin
  }

  /** DuckDB VALUES rows for [[Lnq]] — the same embedded integers. */
  def lnqValuesSql: String =
    Lnq.map { case (c, q) => s"('$c', $q)" }.mkString(", ")

  /** The reference's pre-filter (drop N-containing codons, else trim to
    * ×3) — DEAD CODE there: computed but never passed to cai_for_gene
    * (extendingDB_FeatureAndStrainMetrics.py:54-68). Kept only so the
    * deviation-vs-fidelity choice stays documented; [[caiForGene]] does
    * NOT call it.
    */
  def preFilter(seq: String): String = {
    val s = seq.toUpperCase
    if (s.contains('N')) {
      val sb = new StringBuilder
      var i = 0
      while (i <= s.length - 3) {
        val part = s.substring(i, i + 3)
        if (!part.contains('N')) sb.append(part)
        i += 3
      }
      sb.toString
    } else if (s.length % 3 != 0) s.substring(0, s.length - s.length % 3)
    else s
  }

  /** CAI of a gene; None where the reference records NaN. Operates on the
    * RAW sequence like Biopython's cai_for_gene on the reference's call
    * path: a trailing 1-2-base partial codon or any codon containing 'N'
    * is an illegal codon -> raise -> NaN (None here).
    */
  def caiForGene(dnaSequence: String): Option[Double] = {
    if (dnaSequence == null) return None
    val s = dnaSequence.toUpperCase
    var logSum = 0.0
    var n = 0
    var i = 0
    while (i < s.length) {
      val codon = s.substring(i, math.min(i + 3, s.length))
      SharpEcoliIndex.get(codon) match {
        case Some(w) =>
          if (!Skipped.contains(codon)) { logSum += math.log(w); n += 1 }
        case None =>
          if (!Stops.contains(codon)) return None // illegal codon -> NaN path
      }
      i += 3
    }
    if (n == 0) Some(1.0) // exp(0 / -1)
    else if (n == 1) None // division by zero in the (n-1) mean -> NaN path
    else Some(math.exp(logSum / (n - 1.0)))
  }

  /** GC as Option: None for null/missing sequence, so enrichment skips the
    * row in per-strain aggregates exactly like the null-CAI path (Neo4j
    * avg/stDev ignore missing properties; a fabricated GC=0.0 would skew
    * the strain z-scores).
    */
  def gcContentOpt(seq: String): Option[Double] =
    if (seq == null || seq.isEmpty) None else Some(gcContent(seq))

  /** GC percentage (Biopython `GC`): G/C/S over total, 0 for empty. */
  def gcContent(seq: String): Double = {
    if (seq == null || seq.isEmpty) return 0.0
    var gc = 0
    var i = 0
    while (i < seq.length) {
      val c = seq.charAt(i)
      if (c == 'G' || c == 'C' || c == 'g' || c == 'c' || c == 'S' || c == 's') gc += 1
      i += 1
    }
    gc * 100.0 / seq.length
  }
}

package graft.functions

/** Delta codec between an aligned sequence and its cluster reference.
  *
  * Reproduces the reference's `determineVariation`
  * (pirateToDatabase.py:175-197) and `variationToFullSequence`
  * (extendingDB_FeatureAndStrainMetrics.py:21-29):
  *
  *  - encode: scan positions; at each mismatch emit `<gap><base>` where
  *    `gap` = distance from the previous mismatch index (the first gap is
  *    the absolute index). Identical sequences encode to "".
  *  - decode: apply `(\d+)(\D)` diffs cumulatively onto the reference,
  *    then strip alignment gaps ('-').
  *
  * Pure string→string, registered as Spark UDFs (Projections use them via
  * `GraftFunctions.register`); hot enough at 100 TB to justify a codegen
  * `Expression` later, but the UDF stays inside one codegen boundary per
  * row batch and never shuffles.
  */
object VariationCodec {

  /** Encode the positional differences of `seq` vs `refSeq` (equal length). */
  def encode(seq: String, refSeq: String): String = {
    if (seq == null || refSeq == null) return null
    val sb = new StringBuilder
    var previousDiff = 0
    val n = math.min(seq.length, refSeq.length)
    var i = 0
    while (i < n) {
      if (seq.charAt(i) != refSeq.charAt(i)) {
        sb.append(i - previousDiff).append(seq.charAt(i))
        previousDiff = i
      }
      i += 1
    }
    sb.toString
  }

  private val DiffRe = raw"(\d+)(\D)".r

  /** Apply `variation` onto `referenceSequence`; null variation means
    * "no diffs recorded" (reference locus itself). Gaps stripped last,
    * matching the reference's `.replace('-','')` post-step.
    */
  def decode(variation: String, referenceSequence: String): String = {
    if (referenceSequence == null) return null
    val chars = referenceSequence.toCharArray
    if (variation != null) {
      var index = 0
      DiffRe.findAllMatchIn(variation).foreach { m =>
        index += m.group(1).toInt
        if (index < chars.length) chars(index) = m.group(2).charAt(0)
      }
    }
    new String(chars).replace("-", "")
  }
}

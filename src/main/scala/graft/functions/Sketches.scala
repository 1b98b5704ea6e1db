package graft.functions

/** Deterministic sketching kernels for the large-scale dedup / similarity
  * operators (PipelineOps d2/d3/d6). Engine-portable by construction: all
  * hashing is explicit polynomial / LCG arithmetic on Long — no JVM
  * `hashCode`, no RNG — so signatures are stable across Spark versions,
  * partitionings, and re-runs (a hard requirement for incremental dedup
  * over a 100 TB corpus).
  */
object Sketches {

  private val P = 1000000007L // signature prime

  /** Portable polynomial string hash (base 31, mod 1e9+7). */
  def stringHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31 + s.charAt(i)) % P; i += 1 }
    h
  }

  /** Per-permutation affine coefficients (Knuth LCG mixes of the index). */
  @inline private def coefA(i: Int): Long = 2654435761L + 40503L * i
  @inline private def coefB(i: Int): Long = 2246822519L + 9973L * i

  /** Fold one token hash into a minhash signature-in-progress — the single
    * home of the permutation arithmetic (the scalar [[minHash]] and the
    * codegen kernel [[MinhashBandsExpr]] both fold through here, so their
    * signatures are identical by construction).
    */
  def minHashUpdate(sig: Array[Long], h: Long): Unit = {
    var i = 0
    while (i < sig.length) {
      val v = (coefA(i) % P * (h % P) % P + coefB(i)) % P
      if (v < sig(i)) sig(i) = v
      i += 1
    }
  }

  /** MinHash signature of a token set: sig(i) = min over tokens of
    * (a_i·h(tok) + b_i) mod p.
    */
  def minHash(tokens: Iterable[String], numPerms: Int): Array[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    tokens.foreach(t => minHashUpdate(sig, stringHash(t)))
    sig
  }

  /** LSH band keys: r rows per band hashed into one Long per band. */
  def bandKeys(sig: Array[Long], rowsPerBand: Int): Array[Long] = {
    val nBands = sig.length / rowsPerBand
    Array.tabulate(nBands) { b =>
      var h = b.toLong // band index in the key prevents cross-band collisions
      var i = b * rowsPerBand
      while (i < (b + 1) * rowsPerBand) { h = (h * 1315423911L + sig(i)) % P; i += 1 }
      h
    }
  }

  /** 64-bit SimHash over a token multiset: sign of the per-bit weighted sum
    * of portable 64-bit token hashes (splitmix64 finalizer of the
    * polynomial hash).
    */
  def simHash(tokens: Iterable[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach(t => simHashAccumulate(acc, stringHash(t)))
    simHashFinish(acc)
  }

  /** Fold one token hash into the 64 per-bit counters (splitmix64
    * finalizer first) — shared by the scalar and [[SimHash64Expr]].
    */
  def simHashAccumulate(acc: Array[Int], tokenHash: Long): Unit = {
    var z = tokenHash + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    val h = z ^ (z >>> 31)
    var bit = 0
    while (bit < 64) {
      if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
      bit += 1
    }
  }

  def simHashFinish(acc: Array[Int]): Long = {
    var out = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Deterministic random-hyperplane signature for cosine LSH (d6): bit j
    * is the sign of Σ_i v(j,i)·x_i with pseudo-random ±weights derived from
    * (j,i) — no RNG, reproducible on any executor.
    */
  def hyperplaneSignature(vec: Array[Float], numPlanes: Int): Long = {
    var sig = 0L
    var j = 0
    while (j < numPlanes) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) {
        val m = (coefA(j * 131 + i) % 2001L) - 1000L // in [-1000, 1000]
        dot += vec(i) * m
        i += 1
      }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

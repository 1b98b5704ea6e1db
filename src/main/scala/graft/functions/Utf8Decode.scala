package graft.functions

/** THE byte-consumption/codepoint rule shared by every kernel that walks
  * raw UTF-8 ([[RollingHash]], [[WindowHashes]]) — one definition, so the
  * totality and kernel-parity invariants cannot drift apart when the rule
  * is edited (ADVICE r8: the rule used to be copied into each kernel plus
  * its count, with only comments keeping them in sync).
  *
  * The rule: standard UTF-8 lead-byte widths, except a lead byte whose
  * declared sequence would run past the buffer is consumed as ONE
  * codepoint equal to the byte itself. Parquet strings are not validated
  * UTF-8, so kernels must be total on dirty bytes — deterministic,
  * never reading past the array. On well-formed input this is exactly
  * codepoint decoding (DuckDB `unicode()`'s view, the oracle's form).
  *
  * Deliberately NOT used by the test suite's re-derivations: those stay
  * independent copies so a bug here cannot hide in both places.
  */
object Utf8Decode {

  /** Bytes consumed by the (possibly malformed) sequence starting at `i`. */
  def width(b: Array[Byte], i: Int): Int = {
    val x = b(i) & 0xFF
    val need = if (x < 0x80) 1 else if (x < 0xE0) 2 else if (x < 0xF0) 3 else 4
    if (need > b.length - i) 1 else need // dangling lead byte: one codepoint
  }

  /** Codepoint of the sequence starting at `i`, under [[width]]'s rule. */
  def codepoint(b: Array[Byte], i: Int): Int = width(b, i) match {
    case 1 => b(i) & 0xFF
    case 2 => ((b(i) & 0x1F) << 6) | (b(i + 1) & 0x3F)
    case 3 => ((b(i) & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
    case _ => ((b(i) & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
      ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
  }

  /** Codepoint count under this rule. `UTF8String.numChars()` disagrees
    * on malformed input (a truncated multibyte lead decodes to MORE
    * codepoints here — each orphaned byte is one — a stray continuation
    * byte to FEWER), and output arrays sized by anything other than the
    * decoder's own count break the total-function contract.
    */
  def count(b: Array[Byte]): Int = {
    var i = 0
    var c = 0
    while (i < b.length) { i += width(b, i); c += 1 }
    c
  }
}

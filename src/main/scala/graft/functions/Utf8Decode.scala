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

  /** One-dispatch decode of the (possibly malformed) sequence starting
    * at `i`: the low 32 bits are the codepoint, the high 32 the bytes
    * consumed — hot kernels call this once per character instead of
    * paying the lead-byte dispatch twice via width+codepoint.
    */
  def cpWidth(b: Array[Byte], i: Int): Long = {
    val x = b(i) & 0xFF
    val need = if (x < 0x80) 1 else if (x < 0xE0) 2 else if (x < 0xF0) 3 else 4
    if (need > b.length - i) (1L << 32) | x // dangling lead byte: one codepoint
    else need match {
      case 1 => (1L << 32) | x
      case 2 => (2L << 32) | (((x & 0x1F) << 6) | (b(i + 1) & 0x3F))
      case 3 => (3L << 32) |
        (((x & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F))
      case _ => (4L << 32) |
        (((x & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F))
    }
  }

  /** Bytes consumed by the (possibly malformed) sequence starting at `i`. */
  def width(b: Array[Byte], i: Int): Int = {
    val x = b(i) & 0xFF
    val need = if (x < 0x80) 1 else if (x < 0xE0) 2 else if (x < 0xF0) 3 else 4
    if (need > b.length - i) 1 else need // dangling lead byte: one codepoint
  }

  /** Codepoint of the sequence starting at `i`, under [[width]]'s rule. */
  def codepoint(b: Array[Byte], i: Int): Int = (cpWidth(b, i) & 0xFFFFFFFFL).toInt

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

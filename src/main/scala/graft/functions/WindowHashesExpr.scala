package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `window_hashes(text, w)` — the content-defined-chunking kernel (d18):
  * for every 1-indexed codepoint position `i` in `[w, n]`, the base-31
  * polynomial hash mod 1e9+7 of the codepoint window `[i-w+1, i]`
  * (init 0 — [[RollingHash]]'s recurrence restricted to a sliding
  * window). Output index 0 corresponds to position `w`; empty array for
  * texts shorter than `w` codepoints.
  *
  * ONE pass over the UTF-8 bytes with a `w`-slot circular codepoint
  * buffer: `h_i = (h_{i-1}·31 + c_i − c_{i-w}·31^w) mod P`. The builtin
  * chain it replaces — `transform(sequence(w, n), i -> aggregate(...
  * substring(text, i-w+1, w) ...))` — re-decodes and re-hashes `w`
  * characters per position (O(n·w) with a substring allocation each);
  * this kernel is O(n) and allocates only the output array. Codepoint
  * decode (incl. the dangling-lead-byte total-function clause) is
  * byte-for-byte [[RollingHash.compute]]'s, so the two kernels agree on
  * every input and the DuckDB oracle's `unicode()` form matches both.
  */
object WindowHashes {
  private val Mod = 1000000007L

  def compute(s: UTF8String, w: Int): ArrayData = {
    val b = s.getBytes
    // output sized by the decoder's OWN codepoint count (Utf8Decode.count
    // — the one shared rule): UTF8String.numChars() disagrees on
    // malformed UTF-8, and any other count breaks the total-function
    // contract (write past the array / silent trailing zeros)
    val nChars = Utf8Decode.count(b)
    if (w < 1 || nChars < w) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    // 31^w mod P
    var bw = 1L
    var e = 0
    while (e < w) { bw = bw * 31 % Mod; e += 1 }
    val ring = new Array[Long](w)
    val out = new Array[Long](nChars - w + 1)
    var acc = 0L
    var i = 0 // byte index
    var pos = 0 // codepoint index (0-based)
    while (i < b.length) {
      val cw = Utf8Decode.cpWidth(b, i)
      val cp = (cw & 0xFFFFFFFFL).toInt
      i += (cw >>> 32).toInt
      acc = (acc * 31 + cp) % Mod
      if (pos >= w) {
        // drop the codepoint that slid out of the window
        acc = (acc - ring(pos % w) * bw % Mod + Mod) % Mod
      }
      ring(pos % w) = cp
      if (pos >= w - 1) out(pos - (w - 1)) = acc
      pos += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class WindowHashesExpr(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowHashes.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashesExpr =
    copy(child = newChild)
}

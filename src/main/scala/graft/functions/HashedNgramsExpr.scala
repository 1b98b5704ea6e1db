package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `hashed_ngrams(tokens, n)` — the d9/d9b/t5 word-n-gram kernel as ONE
  * primitive pass: `out(i)` = xxhash64 (seed 42, Spark's builtin) of the
  * space-joined window `tokens[i..i+n-1]`, for every window start; empty
  * array below n tokens. The output INDEX is the 0-based gram position,
  * so `posexplode` recovers (position, digest) with no struct building.
  *
  * Drop-in hash-equal, for null-free token arrays (the only shape the
  * split+filter callers produce), to
  * `transform(sequence(1, size(ts)-n+1), i -> xxhash64(array_join(slice(ts, i, n), ' ')))`
  * — which allocates a joined string, a boxed Long and a struct per
  * window. Here one reusable byte buffer (sized once via a sliding byte
  * count) receives each window's token bytes + 0x20 separators and is
  * hashed in place: zero per-window allocation. On arrays that DO contain
  * nulls the two forms diverge by design: `array_join` silently drops null
  * elements and their separators, while this kernel hashes each null as an
  * empty string between its separators — positions stay aligned with the
  * input, which is what the posexplode consumers (d9b) rely on.
  */
object HashedNgrams {
  private val SEED = 42L

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (n < 1 || len < n) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    // size the shared buffer to the largest window via a sliding byte sum
    var winBytes = 0
    i = 0
    while (i < n) { winBytes += toks(i).numBytes(); i += 1 }
    var maxBytes = winBytes
    var k = 1
    while (k <= len - n) {
      winBytes += toks(k + n - 1).numBytes() - toks(k - 1).numBytes()
      if (winBytes > maxBytes) maxBytes = winBytes
      k += 1
    }
    val buf = new Array[Byte](maxBytes + (n - 1))
    val out = new Array[Long](len - n + 1)
    var p = 0
    while (p <= len - n) {
      var off = 0
      var q = p
      while (q < p + n) {
        if (q > p) { buf(off) = ' '.toByte; off += 1 }
        val t = toks(q)
        t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
        off += t.numBytes()
        q += 1
      }
      out(p) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, off, SEED)
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class HashedNgramsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    HashedNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): HashedNgramsExpr =
    copy(child = newChild)
}

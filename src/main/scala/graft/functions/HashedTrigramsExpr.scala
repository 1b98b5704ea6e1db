package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hashed_trigrams(s)` — the d4 shingle kernel as ONE primitive pass:
  * ascending-sorted, duplicate-free xxhash64 values (seed 42, Spark's
  * `xxhash64` builtin) of every 3-character substring of `s`; empty array
  * below 3 chars.
  *
  * Drop-in equal to
  * `array_sort(array_distinct(transform(sequence(1, length(s) - 2),
  * i -> xxhash64(substring(s, i, 3)))))` — which allocates a boxed Long
  * per trigram, a hash set per document (array_distinct) and a boxed sort
  * (array_sort). Here: an ASCII fast path hashes 3 bytes in place with no
  * substring allocation (the d4 normalizer emits lowercase ASCII, so this
  * is the path that runs), `Arrays.sort` over a primitive long[], adjacent
  * dedupe, and an `UnsafeArrayData.fromPrimitiveArray` result. Multibyte
  * input falls back to per-trigram `substringSQL` with byte-identical
  * hashes.
  */
object HashedTrigrams {
  private val SEED = 42L

  def compute(s: UTF8String): ArrayData = {
    val nChars = s.numChars()
    if (nChars < 3) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val out = new Array[Long](nChars - 2)
    if (s.numBytes() == nChars) {
      // ASCII: char == byte; hash each 3-byte window in place
      val base = s.getBaseObject
      val off = s.getBaseOffset
      var i = 0
      while (i < nChars - 2) {
        out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + i, 3, SEED)
        i += 1
      }
    } else {
      var i = 0
      while (i < nChars - 2) {
        // substring is 1-based in SQL; hash must match xxhash64(substring)
        out(i) = XxHash64Function.hash(s.substringSQL(i + 1, 3), StringType, SEED)
        i += 1
      }
    }
    java.util.Arrays.sort(out)
    // adjacent dedupe over the sorted primitives
    var w = 1
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, w))
  }
}

case class HashedTrigramsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_trigrams"

  override protected def nullSafeEval(input: Any): Any =
    HashedTrigrams.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the loop lives in a compiled static helper; codegen emits one call,
    // keeping the surrounding projection inside whole-stage codegen
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedTrigrams.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): HashedTrigramsExpr =
    copy(child = newChild)
}

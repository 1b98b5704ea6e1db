package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level variation decoder (SURVEY P8, the enrichment pass's hottest
  * scalar: one call per CDS feature,
  * extendingDB_FeatureAndStrainMetrics.py:21-29).
  *
  * Drop-in for [[VariationCodec.decode]] on EVERY input: the fast path
  * parses the `(\d+)(\D)` diff stream and strips '-' gaps in one pass
  * over the UTF-8 bytes, and anything it can't prove equivalent on —
  * a non-ASCII byte on either side (byte != char indexing), or a gap
  * run of 10+ digits (int accumulation could overflow where the
  * scalar's `toInt` throws) — routes to the scalar itself.
  * GcContentExprSpec pins the equivalence on multibyte/dirty fuzz.
  */
object VariationDecode {

  private[functions] def asciiOnly(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) { if (b(i) < 0) return false; i += 1 }
    true
  }

  /** ascii AND every digit run ≤ 9 long (so `num` stays far from overflow) */
  private def fastPathOk(b: Array[Byte]): Boolean = {
    var run = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c < 0) return false
      if (c >= '0' && c <= '9') { run += 1; if (run > 9) return false }
      else run = 0
      i += 1
    }
    true
  }

  /** Null contract is the scalar's, NOT null-safe: null reference → null,
    * null variation + non-null reference → gap-stripped reference.
    */
  def compute(variation: UTF8String, reference: UTF8String): UTF8String = {
    if (reference == null) return null
    val rb = reference.getBytes
    val vb = if (variation == null) null else variation.getBytes
    if (!asciiOnly(rb) || (vb != null && !fastPathOk(vb)))
      return UTF8String.fromString(VariationCodec.decode(
        if (variation == null) null else variation.toString, reference.toString))
    val out = rb.clone()
    if (vb != null) {
      var index = 0
      var p = 0
      while (p < vb.length) {
        var num = 0
        var digits = 0
        while (p < vb.length && vb(p) >= '0' && vb(p) <= '9') {
          num = num * 10 + (vb(p) - '0'); digits += 1; p += 1
        }
        if (p < vb.length) { // a \D to pair the digits with (else: no match)
          val c = vb(p); p += 1
          if (digits > 0) {
            index += num
            if (index < out.length) out(index) = c
          }
        }
      }
    }
    var w = 0
    var r = 0
    while (r < out.length) {
      if (out(r) != '-') { out(w) = out(r); w += 1 }
      r += 1
    }
    UTF8String.fromBytes(out, 0, w)
  }
}

/** `variation_decode_native(variation, reference)` —
  * [[VariationDecode.compute]] as a codegen scalar. Custom (non-null-safe)
  * codegen because a null variation is MEANINGFUL — it's the cluster's
  * reference locus itself, which still must decode (gap-strip) rather
  * than propagate null; only a null reference nulls the output.
  */
case class VariationDecodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = right.nullable
  override def prettyName: String = "variation_decode_native"

  override def eval(input: InternalRow): Any = {
    val ref = right.eval(input)
    if (ref == null) null
    else VariationDecode.compute(
      left.eval(input).asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
      ${r.code}
      boolean ${ev.isNull} = ${r.isNull};
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        ${l.code}
        ${ev.value} = graft.functions.VariationDecode.compute(
          ${l.isNull} ? null : ${l.value}, ${r.value});
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VariationDecodeExpr =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level variation delta encoder (SURVEY P7,
  * pirateToDatabase.py:175-197) — the ETL's hottest scalar (one call per
  * distinct aligned sequence).
  *
  * Drop-in for [[VariationCodec.encode]] on EVERY input: the fast path
  * compares the UTF-8 byte arrays directly (byte index == char index on
  * ASCII, the DNA + '-' domain); any non-ASCII byte on either side — where
  * byte-wise and char-wise diffs diverge — routes to the scalar itself.
  * GcContentExprSpec pins the equivalence on multibyte/dirty fuzz.
  */
object VariationEncode {

  def compute(seq: UTF8String, ref: UTF8String): UTF8String = {
    val sa = seq.getBytes
    val sb = ref.getBytes
    if (!VariationDecode.asciiOnly(sa) || !VariationDecode.asciiOnly(sb))
      return UTF8String.fromString(
        VariationCodec.encode(seq.toString, ref.toString))
    val n = math.min(sa.length, sb.length)
    val out = new java.lang.StringBuilder
    var prev = 0
    var i = 0
    while (i < n) {
      if (sa(i) != sb(i)) {
        out.append(i - prev).append((sa(i) & 0xFF).toChar)
        prev = i
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** `variation_encode_native(seq, ref)` — [[VariationEncode.compute]] as a
  * codegen scalar; null-safe (the scalar returns null when either side is
  * null, exactly nullSafeEval's contract).
  */
case class VariationEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "variation_encode_native"

  override protected def nullSafeEval(seq: Any, ref: Any): Any =
    VariationEncode.compute(
      seq.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.VariationEncode.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VariationEncodeExpr =
    copy(left = newLeft, right = newRight)
}

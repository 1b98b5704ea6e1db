package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen form of the variation delta encoder (SURVEY P7,
  * pirateToDatabase.py:175-197) — the ETL's hottest scalar (one call per
  * aligned sequence). Semantics identical to [[VariationCodec.encode]] for
  * the ASCII alphabets the data uses (DNA + '-' gaps); byte-wise compare
  * on the UTF-8 arrays, no per-row deserialization boundary.
  *
  * Registered as `variation_encode_native` alongside the UDF form;
  * promotion path per the brief: built-ins > Expression > UDF.
  */
case class VariationEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "variation_encode_native"

  override protected def nullSafeEval(seq: Any, ref: Any): Any = {
    val sa = seq.asInstanceOf[UTF8String].getBytes
    val sb = ref.asInstanceOf[UTF8String].getBytes
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sa = ctx.freshName("sa"); val sb = ctx.freshName("sb")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val prev = ctx.freshName("prev"); val i = ctx.freshName("i")
      s"""
         |byte[] $sa = $a.getBytes();
         |byte[] $sb = $b.getBytes();
         |int $n = Math.min($sa.length, $sb.length);
         |StringBuilder $out = new StringBuilder();
         |int $prev = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($sa[$i] != $sb[$i]) {
         |    $out.append($i - $prev);
         |    $out.append((char) ($sa[$i] & 0xFF));
         |    $prev = $i;
         |  }
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($out.toString());
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VariationEncodeExpr =
    copy(left = newLeft, right = newRight)
}

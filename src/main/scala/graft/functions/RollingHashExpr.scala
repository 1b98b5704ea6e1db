package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(text)` — t4's document fingerprint (base-31 polynomial
  * hash mod 1e9+7 over character codepoints) as ONE pass over the UTF-8
  * bytes. The builtin chain it replaces —
  * `aggregate(transform(split(text, ''), x -> ascii(x)), 0L, (acc, c) -> (acc*31 + c) % 1000000007)`
  * — materializes a per-character string array plus a boxed long per
  * character (VERDICT r4 efficiency note); this kernel allocates nothing
  * and decodes codepoints inline.
  *
  * Codepoint semantics match DuckDB's `unicode()` (the oracle's form) on
  * well-formed UTF-8. On ASCII text this is also exactly the builtin
  * chain; on multibyte characters Spark's `ascii()` reads the FIRST BYTE
  * (sign-extended), so the old chain was only ever oracle-correct for
  * ASCII — the kernel upgrades multibyte handling rather than reproducing
  * that quirk (GcContentExprSpec pins both facts).
  */
object RollingHash {
  private val Mod = 1000000007L

  def compute(s: UTF8String): Long = {
    val b = s.getBytes
    var acc = 0L
    var i = 0
    // decode rule (incl. dangling-lead-byte totality) is Utf8Decode's —
    // the ONE shared definition, so this kernel, WindowHashes, and the
    // count stay byte-for-byte in sync on dirty corpora; cpWidth packs
    // (codepoint, width) so each char pays ONE lead-byte dispatch
    while (i < b.length) {
      val cw = Utf8Decode.cpWidth(b, i)
      acc = (acc * 31 + (cw & 0xFFFFFFFFL)) % Mod
      i += (cw >>> 32).toInt
    }
    acc
  }
}

case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

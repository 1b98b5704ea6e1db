package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen forms of the [[Sketches]] kernels — the signature computations
  * of d2 (minhash bands), d3 (simhash) and d6/d8 (hyperplane LSH), which
  * ran as Scala UDFs before: every row paid a Tungsten→JVM materialization
  * of its token/float array at the UDF boundary. Each expression below is
  * one static call per row over the unsafe representation, inside
  * whole-stage codegen, folding through the SAME per-token helpers as the
  * scalars ([[Sketches.minHashUpdate]]/[[Sketches.simHashAccumulate]]) so
  * signatures are identical by construction — the stability contract
  * incremental dedup depends on (StreamingJobs.incrementalNearDedup).
  * SketchExprsSpec pins scalar equivalence on random + multibyte fuzz.
  */
object SketchKernels {

  private val P = 1000000007L

  /** [[Sketches.stringHash]] over a UTF8String without materializing a
    * java.lang.String: bytes == UTF-16 code units on ASCII; non-ASCII
    * tokens route through toString so the hash is char-identical to the
    * scalar on every input.
    */
  def tokenHash(t: UTF8String): Long = {
    val b = t.getBytes
    var i = 0
    while (i < b.length) {
      if (b(i) < 0) return Sketches.stringHash(t.toString)
      i += 1
    }
    var h = 0L
    i = 0
    while (i < b.length) { h = (h * 31 + b(i)) % P; i += 1 }
    h
  }

  /** bandKeys(minHash(tokens)) in one pass. Null tokens are skipped
    * (unreachable from the split/filter chains that feed this; the UDF
    * form would NPE there).
    */
  def minhashBands(arr: ArrayData, numPerms: Int, rowsPerBand: Int): ArrayData = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) Sketches.minHashUpdate(sig, tokenHash(arr.getUTF8String(t)))
      t += 1
    }
    new GenericArrayData(Sketches.bandKeys(sig, rowsPerBand))
  }

  /** simHash(lower(text).split(" +").filter(nonEmpty)) — tokenized
    * in-place over the bytes on the ASCII path (lower = +32 on A-Z, the
    * only case Java's toLowerCase changes there); any non-ASCII byte
    * routes the whole text through the scalar chain verbatim.
    */
  def simhash64(text: UTF8String): Long = {
    val b = text.getBytes
    var i = 0
    while (i < b.length) {
      if (b(i) < 0)
        return Sketches.simHash(
          text.toString.toLowerCase.split(" +").filter(_.nonEmpty).toSeq)
      i += 1
    }
    val acc = new Array[Int](64)
    i = 0
    while (i < b.length) {
      while (i < b.length && b(i) == ' ') i += 1
      if (i < b.length) {
        var h = 0L
        while (i < b.length && b(i) != ' ') {
          var c: Int = b(i)
          if (c >= 'A' && c <= 'Z') c += 32
          h = (h * 31 + c) % P
          i += 1
        }
        Sketches.simHashAccumulate(acc, h)
      }
    }
    Sketches.simHashFinish(acc)
  }

  def hyperplaneSig(arr: ArrayData, numPlanes: Int): Long =
    Sketches.hyperplaneSignature(arr.toFloatArray(), numPlanes)
}

/** `minhash_bands(tokens, numPerms, rowsPerBand)` — LSH band keys of the
  * token array's minhash signature (d2 / Similarity.lshCandidates /
  * streaming incremental dedup).
  */
case class MinhashBandsExpr(child: Expression, numPerms: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.minhashBands(input.asInstanceOf[ArrayData], numPerms, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.SketchKernels.minhashBands($c, $numPerms, $rowsPerBand);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashBandsExpr =
    copy(child = newChild)
}

/** `simhash64(text)` — Charikar 64-bit simhash of the whitespace token
  * multiset (d3).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.SketchKernels.simhash64($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** `hyperplane_sig(vec, numPlanes)` — deterministic random-hyperplane
  * cosine-LSH signature of a float vector (d6: 8 planes, d8: 32).
  */
case class HyperplaneSigExpr(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.hyperplaneSig(input.asInstanceOf[ArrayData], numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.SketchKernels.hyperplaneSig($c, $numPlanes);"
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** `cai_quantized(dna)` — the oracle-matchable CAI (P10) as ONE codegen
  * pass. Bit-identical to [[Cai.caiQuantizedSql]]'s relational form (the
  * same embedded integer `ln w·1e9` table, the same (n−1) Biopython mean,
  * the same floor-quantized `exp`; both run `java.lang.Math.exp`) but
  * ~20× cheaper: the relational form re-derives the codon array across
  * its CASE branches and pays a 59-entry linear `element_at` scan per
  * codon, where this kernel does a packed-codon array lookup per 3 bytes
  * with zero allocation. CaiRelationalSpec pins the three-way equality
  * (kernel == relational == scalar caiForGene up to quantization).
  *
  * Input contract: uppercase DNA (the dnaOf derivation), like the
  * relational form — no case folding here.
  */
object CaiQuantized {
  private val Bad  = Long.MinValue      // unknown codon -> NaN path
  private val Skip = Long.MinValue + 1  // ATG/TGG (excluded) and stops

  // (c0-'A')*32*32 + (c1-'A')*32 + (c2-'A') for A..Z fits in 26k cells
  private val Table: Array[Long] = {
    val t = Array.fill(32 * 32 * 32)(Bad)
    def idx(c: String) =
      ((c(0) - 'A') << 10) | ((c(1) - 'A') << 5) | (c(2) - 'A')
    Cai.Lnq.foreach { case (c, q) => t(idx(c)) = q }
    Seq("ATG", "TGG", "TGA", "TAA", "TAG").foreach(c => t(idx(c)) = Skip)
    t
  }

  // exact math.log(w) doubles, same table layout — the [[computeExact]]
  // path sums THESE in codon order, so its log-sum is bit-identical to
  // [[Cai.caiForGene]]'s (math.log is deterministic per input)
  private val LnExact: Array[Double] = {
    val t = new Array[Double](32 * 32 * 32)
    Cai.Lnq.foreach { case (c, _) =>
      t(((c(0) - 'A') << 10) | ((c(1) - 'A') << 5) | (c(2) - 'A')) =
        math.log(Cai.SharpEcoliIndex(c))
    }
    t
  }

  /** CAI (floor-quantized to 1e-9) or null where the reference records
    * NaN — exactly [[Cai.caiQuantizedSql]]'s value on every input.
    */
  def compute(s: UTF8String): java.lang.Double = {
    val b = s.getBytes
    if (b.length == 0) return 1.0
    var qsum = 0L
    var n = 0
    var i = 0
    while (i < b.length) {
      if (i + 3 > b.length) return null // trailing partial codon -> NaN
      val c0 = b(i) - 'A'; val c1 = b(i + 1) - 'A'; val c2 = b(i + 2) - 'A'
      if ((c0 | c1 | c2) < 0 || c0 > 25 || c1 > 25 || c2 > 25) return null
      val v = Table((c0 << 10) | (c1 << 5) | c2)
      if (v == Bad) return null
      else if (v != Skip) { qsum += v; n += 1 }
      i += 3
    }
    if (n == 0) 1.0
    else if (n == 1) null
    else {
      val cai = math.exp((qsum.toDouble / 1e9) / (n - 1))
      math.floor(cai * 1e9 + 0.5) / 1e9
    }
  }

  /** UNQUANTIZED CAI, bit-identical to [[Cai.caiForGene]] (the Biopython
    * fidelity contract, enrichment's product path): exact `math.log(w)`
    * doubles summed in codon order, `exp(sum / (n-1))` un-rounded, and
    * ASCII case folding (`& 0xDF` uppercases a-z; every other byte it
    * perturbs still fails the A-Z range check, so classification matches
    * `toUpperCase` on the DNA domain — non-ASCII bytes are an unknown
    * codon → null on both paths).
    */
  def computeExact(s: UTF8String): java.lang.Double = {
    val b = s.getBytes
    var logSum = 0.0
    var n = 0
    var i = 0
    while (i < b.length) {
      if (i + 3 > b.length) return null // trailing partial codon -> NaN
      val c0 = (b(i) & 0xDF) - 'A'
      val c1 = (b(i + 1) & 0xDF) - 'A'
      val c2 = (b(i + 2) & 0xDF) - 'A'
      if (c0 < 0 || c0 > 25 || c1 < 0 || c1 > 25 || c2 < 0 || c2 > 25) return null
      val v = Table((c0 << 10) | (c1 << 5) | c2)
      if (v == Bad) return null
      else if (v != Skip) { logSum += LnExact((c0 << 10) | (c1 << 5) | c2); n += 1 }
      i += 3
    }
    if (n == 0) 1.0
    else if (n == 1) null
    else math.exp(logSum / (n - 1.0))
  }
}

case class CaiQuantizedExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cai_quantized"

  override protected def nullSafeEval(input: Any): Any =
    CaiQuantized.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cai")
      s"""
         |java.lang.Double $r = graft.functions.CaiQuantized.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CaiQuantizedExpr =
    copy(child = newChild)
}

/** `cai_native(dna)` — [[CaiQuantized.computeExact]] as a codegen scalar:
  * the enrichment pass's CAI (P10, extendingDB_FeatureAndStrainMetrics
  * .py:45) with no UDF boundary and no quantization. CaiRelationalSpec
  * pins bit-identity with [[Cai.caiForGene]] on random DNA and every
  * scalar edge case.
  */
case class CaiNativeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cai_native"

  override protected def nullSafeEval(input: Any): Any =
    CaiQuantized.computeExact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cai")
      s"""
         |java.lang.Double $r = graft.functions.CaiQuantized.computeExact($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CaiNativeExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen GC-content (SURVEY P9): the hot inner-loop scalar of the
  * enrichment pass, as a Catalyst `UnaryExpression` instead of a Scala UDF —
  * no serialization boundary, stays inside the whole-stage-codegen span of
  * the surrounding projection (prompt preference order: built-ins >
  * Expression > UDF).
  *
  * Operates on the UTF-8 bytes directly (DNA alphabets are ASCII); counts
  * G/C plus the IUPAC 'S' (strong) code, matching [[Cai.gcContent]] /
  * Biopython's `GC`.
  */
case class GcContentExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "gc_content_native"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var gc = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == 'G' || b == 'C' || b == 'g' || b == 'c' || b == 'S' || b == 's') gc += 1
      i += 1
    }
    if (bytes.length == 0) 0.0 else gc * 100.0 / bytes.length
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val gc = ctx.freshName("gc")
      val i = ctx.freshName("i")
      val bv = ctx.freshName("b")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $gc = 0;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $bv = $bytes[$i];
         |  if ($bv == 'G' || $bv == 'C' || $bv == 'g' || $bv == 'c' || $bv == 'S' || $bv == 's') $gc++;
         |}
         |${ev.value} = $bytes.length == 0 ? 0.0 : $gc * 100.0 / $bytes.length;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GcContentExpr =
    copy(child = newChild)
}

/** `SparkSessionExtensions` hook: `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` makes `gc_content_native` available in
  * every session; [[GraftExtensions.registerInto]] does the same for an
  * already-running session (used by the driver-contract queries).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.fn)
    ext.injectFunction(GraftExtensions.encodeFn)
    ext.injectFunction(GraftExtensions.decodeFn)
    ext.injectFunction(GraftExtensions.intersectFn)
    ext.injectFunction(GraftExtensions.trigramsFn)
    ext.injectFunction(GraftExtensions.ngramsFn)
    ext.injectFunction(GraftExtensions.rollingFn)
    ext.injectFunction(GraftExtensions.windowHashesFn)
    ext.injectFunction(GraftExtensions.caiFn)
    ext.injectFunction(GraftExtensions.caiNativeFn)
    ext.injectFunction(GraftExtensions.minhashBandsFn)
    ext.injectFunction(GraftExtensions.simhashFn)
    ext.injectFunction(GraftExtensions.hyperplaneFn)
    ext.injectOptimizerRule(_ => graft.plans.StripCaseChangeUnderGc)
    ext.injectOptimizerRule(_ => graft.plans.SortedIntersectRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.PathSpanJoinStrategy)
  }
}

object GraftExtensions {
  val fn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gc_content_native"),
    new ExpressionInfo(classOf[GcContentExpr].getName, "gc_content_native"),
    (exprs: Seq[Expression]) => GcContentExpr(exprs.head))

  val encodeFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("variation_encode_native"),
    new ExpressionInfo(classOf[VariationEncodeExpr].getName, "variation_encode_native"),
    (exprs: Seq[Expression]) => VariationEncodeExpr(exprs.head, exprs(1)))

  val decodeFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("variation_decode_native"),
    new ExpressionInfo(classOf[VariationDecodeExpr].getName, "variation_decode_native"),
    (exprs: Seq[Expression]) => VariationDecodeExpr(exprs.head, exprs(1)))

  val intersectFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_intersect_size"),
    new ExpressionInfo(classOf[SortedIntersectSizeExpr].getName, "sorted_intersect_size"),
    (exprs: Seq[Expression]) => SortedIntersectSizeExpr(exprs.head, exprs(1)))

  val trigramsFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hashed_trigrams"),
    new ExpressionInfo(classOf[HashedTrigramsExpr].getName, "hashed_trigrams"),
    (exprs: Seq[Expression]) => HashedTrigramsExpr(exprs.head))

  val ngramsFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hashed_ngrams"),
    new ExpressionInfo(classOf[HashedNgramsExpr].getName, "hashed_ngrams"),
    // n must be a foldable int literal: the window width is a plan-time
    // constant (d9/d9b use 6, t5 uses 2 and 3). Validated here so a bad
    // call fails analysis with a message instead of an eval-time cast /
    // index error.
    (exprs: Seq[Expression]) => {
      def fail(msg: String): Nothing =
        throw new org.apache.spark.sql.AnalysisException(
          "_LEGACY_ERROR_TEMP_1332", Map("errorMessage" -> msg))
      if (exprs.length != 2)
        fail(s"hashed_ngrams(tokens, n) takes exactly 2 arguments, got ${exprs.length}")
      val nExpr = exprs(1)
      if (!nExpr.foldable)
        fail(s"hashed_ngrams: n must be a foldable constant, got ${nExpr.sql}")
      if (nExpr.dataType != org.apache.spark.sql.types.IntegerType)
        fail("hashed_ngrams: n must be an INT literal, got " +
          s"${nExpr.sql}: ${nExpr.dataType.simpleString}")
      HashedNgramsExpr(exprs.head, nExpr.eval().asInstanceOf[Int])
    })

  /** A foldable INT literal argument, or a clear analysis error (the
    * hashed_ngrams contract: sketch widths are plan-time constants).
    */
  private def foldableInt(fn: String, arg: String, e: Expression): Int = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_1332", Map("errorMessage" -> msg))
    if (!e.foldable) fail(s"$fn: $arg must be a foldable constant, got ${e.sql}")
    if (e.dataType != org.apache.spark.sql.types.IntegerType)
      fail(s"$fn: $arg must be an INT literal, got ${e.sql}: ${e.dataType.simpleString}")
    e.eval().asInstanceOf[Int]
  }

  private def requireArity(fn: String, n: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_1332",
        Map("errorMessage" -> s"$fn takes exactly $n arguments, got ${exprs.length}"))

  val minhashBandsFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_bands"),
    new ExpressionInfo(classOf[MinhashBandsExpr].getName, "minhash_bands"),
    (exprs: Seq[Expression]) => {
      requireArity("minhash_bands(tokens, numPerms, rowsPerBand)", 3, exprs)
      MinhashBandsExpr(exprs.head,
        foldableInt("minhash_bands", "numPerms", exprs(1)),
        foldableInt("minhash_bands", "rowsPerBand", exprs(2)))
    })

  val simhashFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
    (exprs: Seq[Expression]) => {
      requireArity("simhash64(text)", 1, exprs)
      SimHash64Expr(exprs.head)
    })

  val hyperplaneFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_sig"),
    new ExpressionInfo(classOf[HyperplaneSigExpr].getName, "hyperplane_sig"),
    (exprs: Seq[Expression]) => {
      requireArity("hyperplane_sig(vec, numPlanes)", 2, exprs)
      HyperplaneSigExpr(exprs.head, foldableInt("hyperplane_sig", "numPlanes", exprs(1)))
    })

  val rollingFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
    (exprs: Seq[Expression]) => RollingHashExpr(exprs.head))

  val windowHashesFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("window_hashes"),
    new ExpressionInfo(classOf[WindowHashesExpr].getName, "window_hashes"),
    (exprs: Seq[Expression]) => {
      requireArity("window_hashes(text, w)", 2, exprs)
      WindowHashesExpr(exprs.head, foldableInt("window_hashes", "w", exprs(1)))
    })

  val longDotFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("long_dot"),
    new ExpressionInfo(classOf[LongDotExpr].getName, "long_dot"),
    (exprs: Seq[Expression]) => {
      requireArity("long_dot(a, b)", 2, exprs)
      LongDotExpr(exprs.head, exprs(1))
    })

  val caiFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cai_quantized"),
    new ExpressionInfo(classOf[CaiQuantizedExpr].getName, "cai_quantized"),
    (exprs: Seq[Expression]) => CaiQuantizedExpr(exprs.head))

  val caiNativeFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cai_native"),
    new ExpressionInfo(classOf[CaiNativeExpr].getName, "cai_native"),
    (exprs: Seq[Expression]) => CaiNativeExpr(exprs.head))

  def registerInto(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("gc_content_native", fn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("variation_encode_native", encodeFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("variation_decode_native", decodeFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("sorted_intersect_size", intersectFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("hashed_trigrams", trigramsFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("hashed_ngrams", ngramsFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("rolling_hash", rollingFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("window_hashes", windowHashesFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("long_dot", longDotFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("cai_quantized", caiFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("cai_native", caiNativeFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("minhash_bands", minhashBandsFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("simhash64", simhashFn._3, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("hyperplane_sig", hyperplaneFn._3, "built-in")
  }
}

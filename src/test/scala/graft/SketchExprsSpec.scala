package graft

import graft.functions.{GraftExtensions, Sketches}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The sketch codegen kernels (SketchExprs) must produce the SAME
  * signatures as the scalar Sketches chain they replaced — signature
  * stability across engine versions is the contract the persisted
  * signature store / incremental streaming dedup depend on.
  */
class SketchExprsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val rnd = new scala.util.Random(41)

  private def randText(maxTokens: Int, vocab: IndexedSeq[String]): String =
    Seq.fill(rnd.nextInt(maxTokens))(vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")

  test("minhash_bands equals bandKeys(minHash(tokens)) for both parameterizations") {
    import spark.implicits._
    GraftExtensions.registerInto(spark)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ÉÉ", "日本", "x1", "", "a b")
    val sets = (1 to 150).map(_ =>
      Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))) ++
      Seq(Seq.empty[String], Seq("solo"))
    for ((p, r) <- Seq((32, 4), (64, 8))) {
      val got = sets.toDF("ts")
        .select(col("ts"), expr(s"minhash_bands(ts, $p, $r)").as("bk"))
        .collect().map(x => x.getSeq[String](0) -> x.getSeq[Long](1))
      got.foreach { case (ts, bk) =>
        val want = Sketches.bandKeys(Sketches.minHash(ts, p), r).toSeq
        assert(bk == want, s"p=$p r=$r tokens=$ts")
      }
    }
    // null array propagates; interpreted path agrees with codegen
    assert(Seq[Option[Seq[String]]](None).toDF("ts")
      .select(expr("minhash_bands(ts, 32, 4)")).head().isNullAt(0))
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq("aa", "bb", "cc"),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val interp = graft.functions.MinhashBandsExpr(lit, 32, 4)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.toLongArray().toSeq ==
      Sketches.bandKeys(Sketches.minHash(Seq("aa", "bb", "cc"), 32), 4).toSeq)
    // non-literal width is an analysis error, not an eval-time crash
    val err = intercept[Exception] {
      Seq(Seq("a")).toDF("ts").selectExpr("minhash_bands(ts, 32, size(ts))").collect()
    }
    assert(err.getMessage.contains("rowsPerBand"))
  }

  test("the builtin shingle chain reproduces the old shingle UDF exactly") {
    import spark.implicits._
    // d2's contract: tokens = lower, split on spaces, drop empties;
    // < 2 tokens -> the tokens themselves; else distinct space-joined bigrams
    def shingleScalar(text: String): Seq[String] =
      if (text == null) Seq.empty
      else {
        val toks = text.toLowerCase.split(" +").filter(_.nonEmpty)
        if (toks.length < 2) toks.toSeq
        else toks.sliding(2).map(_.mkString(" ")).toSeq.distinct
      }
    val vocab = Vector("the", "Quick", "BROWN", "fox", "héllo", "日本語", "a")
    val texts = (1 to 150).map(_ => randText(12, vocab)) ++
      Seq(null, "", " ", "   ", "one", "  padded   out  ", "a a a a")
    val got = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "text")
      .withColumn("toks",
        expr("filter(split(lower(coalesce(text, '')), ' '), x -> x != '')"))
      .withColumn("sh",
        expr("""CASE WHEN size(toks) < 2 THEN toks
               |ELSE array_distinct(transform(sequence(1, size(toks) - 1),
               |       i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) END"""
          .stripMargin))
      .select(col("i"), col("sh"))
      .collect().map(x => x.getInt(0) -> x.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == shingleScalar(t), s"text='$t'")
    }
  }

  test("simhash64 equals the scalar simHash over lowered whitespace tokens") {
    import spark.implicits._
    GraftExtensions.registerInto(spark)
    def scalar(text: String): Long =
      Sketches.simHash(
        if (text == null) Seq.empty[String]
        else text.toLowerCase.split(" +").filter(_.nonEmpty).toSeq)
    val vocab = Vector("The", "QUICK", "brown", "FOX", "jumps", "höhe", "日本", "123")
    val texts = (1 to 200).map(_ => randText(15, vocab)) ++
      Seq("", " ", "   ", "single", "UPPER lower MiXeD", "a  b   c",
        "héllo wörld again", "日本語 テキスト")
    val got = texts.distinct.toDF("text")
      .select(col("text"), expr("simhash64(coalesce(text, ''))").as("s"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    texts.distinct.foreach(t => assert(got(t) == scalar(t), s"text='$t'"))
    // interpreted path agrees
    val interp = graft.functions.SimHash64Expr(
      org.apache.spark.sql.catalyst.expressions.Literal("UPPER lower MiXeD"))
    assert(interp.eval(null) == scalar("UPPER lower MiXeD"))
  }

  test("hyperplane_sig equals the scalar signature for 8 and 32 planes") {
    import spark.implicits._
    GraftExtensions.registerInto(spark)
    val vecs = (1 to 150).map(_ =>
      Seq.fill(16)(rnd.nextFloat() * 2f - 1f)) :+ Seq.fill(16)(0f)
    for (planes <- Seq(8, 32)) {
      val got = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
        .select(col("i"), expr(s"hyperplane_sig(v, $planes)").as("s"))
        .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
      vecs.zipWithIndex.foreach { case (v, i) =>
        assert(got(i) == Sketches.hyperplaneSignature(v.toArray, planes),
          s"planes=$planes vec#$i")
      }
    }
  }

  test("d3's builtin hamming equals the scalar hammingDistance") {
    import spark.implicits._
    val pairs = (1 to 100).map(_ => (rnd.nextLong(), rnd.nextLong())) ++
      Seq((0L, 0L), (-1L, 0L), (Long.MinValue, Long.MaxValue))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), expr("CAST(bit_count(a ^ b) AS INT)").as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(2) == Sketches.hammingDistance(r.getLong(0), r.getLong(1)))
    }
  }

  test("minhashSignatures rowsPerBand knob: r=2 recovers mid-similarity dups") {
    import spark.implicits._
    // 10 planted mid-similarity pairs: texts share 11 of 16 word bigrams
    // -> shingle-jaccard ≈ 11/21 ≈ 0.52, right where the default 8-band
    // geometry's collision odds are ~coin-flip per pair and r=2's are
    // ≈ 0.99 (the Similarity.bandGeometryFor S-curve). The knob must make
    // every planted pair a candidate; verification keeps them.
    def words(i: Int, n: Int, tag: String) = (0 until n).map(j => s"${tag}_${i}_$j")
    val docs = (0 until 10).flatMap { i =>
      val shared = words(i, 12, "w")            // 11 shared bigrams
      Seq((s"a$i", shared ++ words(i, 5, "p")), // + 5 own bigrams
        (s"b$i", shared ++ words(i, 5, "q")))
    } ++ (0 until 30).map(i => (s"f$i", words(i, 17, "z")))
    val df = docs.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
    val sig = operators.PipelineOps.minhashSignatures(df, rowsPerBand = 2)
    val found = operators.PipelineOps.nearDupPairs(sig, sig, 0.4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = (0 until 10).map(i => (s"a$i", s"b$i")).toSet
    assert(found == want, s"missing: ${want -- found}; extra: ${found -- want}")
    // geometry guard: bands must divide the 32-perm signature
    intercept[IllegalArgumentException] {
      operators.PipelineOps.minhashSignatures(df, rowsPerBand = 5)
    }
  }
}

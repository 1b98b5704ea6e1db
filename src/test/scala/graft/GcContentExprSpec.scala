package graft

import graft.functions.{Cai, GraftExtensions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GcContentExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("native expression matches the scalar kernel on both eval paths") {
    import spark.implicits._
    GraftExtensions.registerInto(spark)
    val inputs = Seq("ACGT", "GGCC", "AATT", "acgtS", "", "ATGNNNGGT")
    val df = inputs.toDF("s")
    // codegen path (default) and interpreted path must agree with Cai.gcContent
    val results = df.select(col("s"), expr("gc_content_native(s)").as("gc"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    inputs.foreach { s =>
      assert(math.abs(results(s) - Cai.gcContent(s)) < 1e-12, s"input '$s'")
    }
    // null propagates
    val nullRow = Seq[Option[String]](None).toDF("s")
      .select(expr("gc_content_native(s)")).head()
    assert(nullRow.isNullAt(0))
  }

  test("native variation encoder matches the scala kernel on random pairs") {
    import spark.implicits._
    import graft.functions.VariationCodec
    GraftExtensions.registerInto(spark)
    val rnd = new scala.util.Random(11)
    val alpha = "ACGT-"
    val pairs = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(90)
      (Array.fill(n)(alpha(rnd.nextInt(5))).mkString,
        Array.fill(n)(alpha(rnd.nextInt(5))).mkString)
    }
    // multibyte pairs exercise the scalar fallback (byte-wise and char-wise
    // diffs diverge there; the kernel must route to the scalar)
    val multi = Seq(("héllo", "hallo"), ("日本語AC", "日本誤AC"),
      ("Aé-G", "Bé-G"), ("ACGT", "AC😀T"))
    val all = pairs ++ multi
    val got = all.toDF("s", "r")
      .selectExpr("s", "r", "variation_encode_native(s, r) AS e")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    all.foreach { case (s, r) =>
      assert(got((s, r)) == VariationCodec.encode(s, r), s"seq=$s ref=$r")
    }
  }

  test("native variation decoder matches the scala kernel on random and dirty pairs") {
    import spark.implicits._
    import graft.functions.{VariationCodec, VariationDecode}
    GraftExtensions.registerInto(spark)
    val rnd = new scala.util.Random(13)
    val alpha = "ACGT-"
    // realistic variation streams: encode mutated copies of random refs
    val pairs = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(90)
      val ref = Array.fill(n)(alpha(rnd.nextInt(5))).mkString
      val seq = ref.toCharArray
      (0 until n).foreach(i => if (rnd.nextInt(8) == 0) seq(i) = alpha(rnd.nextInt(5)))
      (VariationCodec.encode(new String(seq), ref), ref)
    }
    // degenerate streams where the hand parser must agree with the regex
    val dirty = Seq(
      ("", "AC-GT"), ("2C3G", "AAAAAAAAAAAAA"),
      ("X2C", "AAAA"),       // leading junk: regex skips the X, pairs (2,C)
      ("12", "AAAA"),        // trailing digits with no \D -> no match at all
      ("3", "AAAA"), ("--", "AC-GT"), ("0G", "AAAA"), ("0G0T", "AAAA"),
      ("1-", "AAAA"),        // variation writes a gap char -> stripped after
      ("99A", "AAA"),        // index beyond the reference -> ignored
      ("2X", "héllo-wörld"), // multibyte reference -> scalar fallback
      ("é1A", "AAAA"))       // multibyte variation -> scalar fallback
    val all = (pairs ++ dirty).distinct
    val got = all.toDF("v", "r")
      .selectExpr("v", "r", "variation_decode_native(v, r) AS d")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getString(2)).toMap
    all.foreach { case (v, r) =>
      assert(got((v, r)) == VariationCodec.decode(v, r), s"v=$v ref=$r")
    }
    // null contract: null reference -> null; null variation (the cluster's
    // reference locus itself) still decodes to the gap-stripped reference
    val rows = Seq((Some("1C"), None: Option[String]),
        (None: Option[String], Some("AC-GT")))
      .toDF("v", "r").selectExpr("variation_decode_native(v, r) AS d").collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getString(0) == "ACGT")
    // interpreted path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = graft.functions.VariationDecodeExpr(
      Literal("2C3G"), Literal("AAAAAAAAAAAAA"))
    assert(interp.eval(null).toString == "AACAAGAAAAAAA")
    // a 10+-digit gap run routes to the scalar, exceptions and all (the
    // scalar's toInt throws there; silent int wraparound would diverge)
    intercept[NumberFormatException] {
      VariationDecode.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("99999999999999999999X"),
        org.apache.spark.unsafe.types.UTF8String.fromString("AAAA"))
    }
  }

  test("sorted_intersect_size matches array_intersect on random sorted sets") {
    import spark.implicits._
    GraftExtensions.registerInto(spark)
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 200).map { _ =>
      def set() = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong)
        .distinct.sorted.toSeq
      (set(), set())
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq.empty[Long], Seq.empty[Long]))
    val got = pairs.toDF("a", "b")
      .selectExpr("a", "b",
        "sorted_intersect_size(a, b) AS m",
        "size(array_intersect(a, b)) AS e")
      .collect()
    got.foreach { r =>
      assert(r.getInt(2) == r.getInt(3),
        s"a=${r.getSeq[Long](0)} b=${r.getSeq[Long](1)}")
    }
    // interpreted path agrees too
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val e = graft.functions.SortedIntersectSizeExpr(
      Literal.create(ArrayData.toArrayData(Array(1L, 3L, 5L)), ArrayType(LongType)),
      Literal.create(ArrayData.toArrayData(Array(3L, 4L, 5L, 9L)), ArrayType(LongType)))
    assert(e.eval(null) == 2)
  }

  test("extension class wires the function builder") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // must not throw
    val built = GraftExtensions.fn._3(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal("GGGG")))
    assert(built.isInstanceOf[graft.functions.GcContentExpr])
    assert(built.eval(null) == 100.0)
  }

  test("hashed_trigrams equals the builtin chain element-for-element") {
    import spark.implicits._
    GraftExtensions.registerInto(spark)
    val rnd = new scala.util.Random(23)
    val ascii = (1 to 60).map(_ =>
      (1 to rnd.nextInt(40)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val edge = Seq("", "a", "ab", "abc", "aaaaaaa", "ab cd ab cd",
      "héllo wörld", "日本語テキスト", "aßc aßc")
    val df = (ascii ++ edge).toDF("nt")
    val rows = df.select(col("nt"),
        expr("hashed_trigrams(nt)").as("fast"),
        expr("""CASE WHEN length(nt) < 3 THEN CAST(array() AS ARRAY<BIGINT>)
               |ELSE array_sort(array_distinct(transform(sequence(1, length(nt) - 2),
               |       i -> xxhash64(substring(nt, i, 3))))) END""".stripMargin).as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"input '${r.getString(0)}'")
    }
    // null propagates; interpreted path agrees with codegen
    assert(Seq[Option[String]](None).toDF("nt")
      .select(expr("hashed_trigrams(nt)")).head().isNullAt(0))
    val interp = graft.functions.HashedTrigramsExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("ab cd ab cd"))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val viaDf = Seq("ab cd ab cd").toDF("nt")
      .select(expr("hashed_trigrams(nt)")).head().getSeq[Long](0)
    assert(interp.toLongArray().toSeq == viaDf)
  }

  test("rolling_hash equals the builtin ascii-fold chain on ASCII; codepoints beyond") {
    import spark.implicits._
    GraftExtensions.registerInto(spark)
    val rnd = new scala.util.Random(31)
    val ascii = (1 to 80).map(_ =>
      (1 to rnd.nextInt(120)).map(_ => (' ' + rnd.nextInt(95)).toChar).mkString)
    val edge = Seq("", "a", "the quick brown fox", "1234567890", "~~~~")
    val rows = (ascii ++ edge).distinct.toDF("t").select(col("t"),
        expr("rolling_hash(t)").as("fast"),
        expr("aggregate(transform(split(t, ''), x -> ascii(x)), 0L, " +
          "(acc, c) -> (acc * 31 + c) % 1000000007)").as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"input '${r.getString(0)}'")
    }
    // multibyte: the kernel hashes CODEPOINTS (DuckDB unicode() semantics,
    // the oracle's form) — pin against a direct scala codepoint fold
    def ref(s: String): Long = {
      var acc = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }
    val uni = Seq("héllo wörld", "日本語テキスト", "mix: aé日z", "😀 emoji")
    val got = uni.toDF("t").select(col("t"), expr("rolling_hash(t)"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    uni.foreach(s => assert(got(s) == ref(s), s"input '$s'"))
    // null propagates; interpreted path agrees with codegen
    assert(Seq[Option[String]](None).toDF("t")
      .select(expr("rolling_hash(t)")).head().isNullAt(0))
    val interp = graft.functions.RollingHashExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("the quick brown fox"))
    assert(interp.eval(null) == ref("the quick brown fox"))
    // parquet strings are not validated UTF-8: a truncated multibyte tail
    // (dangling lead byte) must hash deterministically, not read past the
    // buffer — the dangling byte hashes as itself
    val dirty = org.apache.spark.unsafe.types.UTF8String.fromBytes(
      Array(0x61.toByte, 0xC3.toByte))
    assert(graft.functions.RollingHash.compute(dirty) ==
      (0x61L * 31 + 0xC3) % 1000000007L)
  }

  test("hashed_ngrams equals the builtin window-hash chain element-for-element") {
    import spark.implicits._
    GraftExtensions.registerInto(spark)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "b", "ccc", "dd", "\u00e9\u00e9", "\u65e5\u672c", "x")
    val corp = (1 to 60).map(_ =>
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    val edge = Seq(Seq.empty[String], Seq("a"), Seq("a", "b"),
      Seq("", "", ""), Seq("sp ace", "tab"))
    for (n <- Seq(2, 3, 6)) {
      val rows = (corp ++ edge).toDF("ts").select(col("ts"),
          expr(s"hashed_ngrams(ts, $n)").as("fast"),
          expr(s"""CASE WHEN size(ts) < $n THEN CAST(array() AS ARRAY<BIGINT>)
                 |ELSE transform(sequence(1, size(ts) - ${n - 1}),
                 |       i -> xxhash64(array_join(slice(ts, i, $n), ' '))) END""".stripMargin)
            .as("slow"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n input ${r.getSeq[String](0)}")
      }
    }
    // null array propagates; interpreted path agrees with codegen
    assert(Seq[Option[Seq[String]]](None).toDF("ts")
      .select(expr("hashed_ngrams(ts, 3)")).head().isNullAt(0))
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq("aa", "bb", "cc", "dd"),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val interp = graft.functions.HashedNgramsExpr(lit, 2)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val viaDf = Seq(Seq("aa", "bb", "cc", "dd")).toDF("ts")
      .select(expr("hashed_ngrams(ts, 2)")).head().getSeq[Long](0)
    assert(interp.toLongArray().toSeq == viaDf)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d10_decontaminate / t6_stratified_sample / x8_training_mix over planted
  * corpora that move every stage the homogeneous sf-testdata can't: a
  * copied eval 6-gram (d10's hit), a skewed language mix (t6's quota
  * actually drops documents — at sf0.01 the gated corpus is single-lang so
  * x8's sampler keeps everything), and a contaminated gated doc inside the
  * x8 funnel. Expected values are hand-derived, including the portable
  * sample hash h(id) = ((id mod p) * 2654435761 + 2246822519) mod p.
  */
class MixDecontamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val P = 1000000007L
  private def h(id: Long): Long = ((id % P) * 2654435761L + 2246822519L) % P

  private def writeDocs(rows: Seq[(Long, String, String)], tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    rows.toDF("doc_id", "text", "lang").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("d10: a copied eval 6-gram flags exactly the copying train doc") {
    val dir = writeDocs(Seq(
      // train doc 1 copies eval doc 7's first 6-gram, then diverges:
      // 10 tokens => 5 gram positions, 1 of them contaminated
      (1L, "alpha beta gamma delta epsilon zeta different tail here now", "en"),
      // train doc 2 shares nothing with the eval slice
      (2L, "totally unrelated words about nothing important here at all ok", "en"),
      // the eval slice (doc_id % 10 == 7): 8 tokens => 3 grams
      (7L, "alpha beta gamma delta epsilon zeta eta theta", "en")), "d10")

    val out = SparkEntry.queries("d10_decontaminate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    // eval doc 7 itself is NOT a result row; frac = 1 distinct hit / 5 grams
    assert(out.toSeq == Seq(
      (1L, 5L, 1L, 0.2, 1),
      (2L, 5L, 0L, 0.0, 0)))
  }

  test("t6: skewed mix downsamples the majority lang by the hash gate, exactly") {
    val dir = writeDocs(Seq(
      (0L, "x", "en"), (1L, "x", "en"), (2L, "x", "en"), (3L, "x", "en"),
      (10L, "x", "fr"), (11L, "x", "fr")), "t6")

    val out = SparkEntry.queries("t6_stratified_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // quota = 2 (fr). en (cnt 4): keep iff h*4 < 2p <=> h < p/2 => ids 0, 3
    // (h(1), h(2) land in the upper half); fr (cnt = quota): keep all.
    assert(out.toSeq == Seq(
      (0L, "en", h(0)), (3L, "en", h(3)),
      (10L, "fr", h(10)), (11L, "fr", h(11))))
    assert(Seq(0L, 3L, 10L, 11L).forall(i => h(i) < P / 2 || i >= 10L))
  }

  test("x8: decontamination and the mix sampler both move the funnel") {
    val dir = writeDocs(Seq(
      // gated en docs (10 tokens, quality 1.0, s_en > 0)
      (1L, "the quick brown fox jumps over the lazy dog again", "en"),
      (2L, "a calm river flows through the quiet green valley today", "en"),
      // gated en doc that copies eval doc 7's first 6-gram => contaminated
      (3L, "the alpha beta gamma delta epsilon zeta is of and", "en"),
      // gated de doc (11 tokens; "is" rides along for the quality gate)
      (4L, "der hund und die katze von haus ist gross is here", "de"),
      (6L, "the tall oak tree stands near a wide open field", "en"),
      // the eval slice
      (7L, "alpha beta gamma delta epsilon zeta eta theta", "en")), "x8")

    val out = SparkEntry.queries("x8_training_mix")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // gated train = {1,2,3,4,6}; decontamination drops 3 => clean = 4 docs,
    // en cnt 3 / de cnt 1, quota 1. en keeps iff h < p/3 => only doc 6
    // (h(1), h(2) too big); de keeps its single doc 4 (cnt == quota).
    // Both survivors hash to shard 7; tokens 10 (en) + 11 (de).
    assert(h(1) * 3 >= P && h(2) * 3 >= P && h(6) * 3 < P)
    assert(h(4) % 8 == 7 && h(6) % 8 == 7)
    assert(out.toSeq == Seq((7L, 2L, 2L, 21L, 5L, 4L)))
  }

  test("t10: temperature mix upsamples the tail lang and hash-deals the head remainder") {
    val dir = writeDocs(
      (0L to 8L).map(i => (i, "x", "en")) :+ ((10L, "x", "fr")), "t10")

    val out = SparkEntry.queries("t10_temperature_mix")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // cnt: en 9, fr 1; wq = floor(sqrt(cnt)*1e6+0.5) = (3e6, 1e6); W = 4e6;
    // N = 10 => targets: en = 10*3e6 div 4e6 = 7, fr = 10*1e6 div 4e6 = 2.
    // en: base 7 div 9 = 0 copies + 1 iff h(id) mod 9 < 7 (the remainder
    // deal); fr: base 2, remainder 0 => doc 10 exactly twice, ungated.
    val keptEn = (0L to 8L).filter(i => h(i) % 9 < 7)
    val expected = (keptEn.map(i => (i, "en", 1L)) ++
      Seq((10L, "fr", 1L), (10L, "fr", 2L))).sortBy(t => (t._1, t._3))
    assert(out.toSeq == expected)
    assert(keptEn.nonEmpty && keptEn.size < 9) // the hash gate actually moves
  }

  test("t11: bit-length surprisal is exact integer arithmetic") {
    val dir = writeDocs(Seq(
      (1L, Seq.fill(14)("c").mkString(" "), "en"),
      (2L, "c r1 r2 r3", "en")), "t11")

    val out = SparkEntry.queries("t11_unigram_surprisal")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
    // T = 18 tokens; cnt(c) = 15 => bits = bitlen(18 div 15 = 1) = 1;
    // unique tokens => bits = bitlen(18) = 5 ('10010')
    assert(out.toSeq == Seq(
      (1L, 14L, 14L, 1.0, "head"),
      (2L, 4L, 16L, 4.0, "head")))
  }

  test("x9: band gate drops the surprising doc; temperature mix upsamples fr") {
    // 9 identical en docs (500 common tokens each), one fr doc (100
    // tokens), one en doc of 19 unique tokens + 'the'. Vocab T = 4620:
    // common tokens bitlen(4620 div ~900) = 3, fr tokens bitlen(231) = 8,
    // unique tokens bitlen(4620) = 13 => the gibberish doc's mean_bits
    // (3 + 19*13)/20 = 12.5 lands in the dropped tail band while en (3.0)
    // and fr (8.0) stay. Then t10's dealing on clean = {9 en, 1 fr}:
    // targets en 7 / fr 2 => en keeps iff h mod 9 < 7, fr ships twice.
    val enIds = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L)
    val en = ("the a of and is " * 100).trim
    // the quality gate's stop list is English, so the fr doc must clear
    // 0.7 via n_toks (0.4) + mean_tok_len 3.0 (0.3); 'est' carries s_fr
    val fr = ("les des une est pour " * 20).trim
    val gib = "the " + (1 to 19).map(i => f"z$i%02d").mkString(" ")
    val dir = writeDocs(enIds.map(i => (i, en, "en")) ++
      Seq((10L, fr, "fr"), (11L, gib, "en")), "x9")

    val out = SparkEntry.queries("x9_curriculum_mix")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val keptEn = enIds.filter(i => h(i) % 9 < 7)
    val m = scala.collection.mutable.Map[Long, (Long, Set[Long], Long)]()
      .withDefault(_ => (0L, Set.empty[Long], 0L))
    def add(sh: Long, id: Long, tk: Long): Unit = {
      val (r, s, t) = m(sh); m(sh) = (r + 1, s + id, t + tk)
    }
    keptEn.foreach(i => add((h(i) + 1) % 8, i, 500L))
    add((h(10L) + 1) % 8, 10L, 100L); add((h(10L) + 2) % 8, 10L, 100L)
    val expected = m.toSeq.map { case (sh, (r, s, t)) =>
      (sh, r, s.size.toLong, t, 11L, 10L, 10L) }.sortBy(_._1)
    assert(out.toSeq == expected)
    assert(keptEn.size < 9) // the en downsample gate actually moves
  }

  test("t7: planted email and digit run are redacted; clean text is identity") {
    val dir = writeDocs(Seq(
      (1L, "contact me at john.doe@example.com or call 5551234 now please ok", "en"),
      (2L, "no private information in this one at all today", "en")), "t7")

    val out = SparkEntry.queries("t7_pii_scrub")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, "contact me at <EMAIL> or call <NUM> now please ok", 1, 1),
      (2L, "no private information in this one at all today", 0, 0)))
  }

  test("d11: a shared 6-gram across sources yields exactly one overlap row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d11").toString
    Seq(
      // srcA and srcB share the 6-gram "one two three four five six";
      // srcC shares nothing. 7 tokens => 2 grams per doc.
      (1L, "one two three four five six seven", "srcA"),
      (2L, "zzz one two three four five six", "srcB"),
      (3L, "totally different words entirely over here again", "srcC"))
      .toDF("doc_id", "text", "source").write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("d11_source_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(("srcA", "srcB", 1L, 2L, 2L, 0.5)))
  }

  test("d12: hand-sized clusters get exact quantized cohesion stats") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d12").toString
    Seq(
      // label 0: two orthogonal unit vectors; each is at 45 deg to the
      // sum centroid => cos = 1/sqrt(2), cq = floor(0.7071068*1e6 + .5)
      (10L, Array(1.0f, 0.0f), 0),
      (11L, Array(0.0f, 1.0f), 0),
      // label 1: a single vector is its own centroid => cos exactly 1
      (12L, Array(3.0f, 4.0f), 1))
      .toDF("vec_id", "embedding", "label").write.parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("d12_embedding_centroids")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val c45 = 707107.0 / 1000000
    assert(out.toSeq == Seq(
      (0, 2L, (707107.0 + 707107.0) / 1000000 / 2, c45, c45),
      (1, 1L, 1000000.0 / 1000000 / 1, 1.0, 1.0)))
  }

  test("t8: chunk geometry at the window/stride boundaries") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, words(3), "en"), (2L, words(64), "en"), (3L, words(65), "en"),
      (4L, words(112), "en"), (5L, words(113), "en")), "t8")
    val out = SparkEntry.queries("t8_chunk_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // n=64 is one full window; n=65 spills 17 tokens into a second
    // chunk; n=112 = 48+64 ends exactly at chunk 1; n=113 needs a third
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 3L, 3L),
      (2L, 0L, 0L, 64L, 64L),
      (3L, 0L, 0L, 64L, 64L), (3L, 1L, 48L, 65L, 17L),
      (4L, 0L, 0L, 64L, 64L), (4L, 1L, 48L, 112L, 64L),
      (5L, 0L, 0L, 64L, 64L), (5L, 1L, 48L, 112L, 64L), (5L, 2L, 96L, 113L, 17L)))
  }

  test("t9: offsets are shard-local running sums; packs split every 256 tokens") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val ids = (0L until 10L)
    val dir = writeDocs(ids.map(i => (i, words(100), "en")), "t9")
    val out = SparkEntry.queries("t9_sequence_pack")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val expected = ids.map(i => (i, h(i) % 16))
      .groupBy(_._2).toSeq.flatMap { case (shard, docs) =>
        docs.map(_._1).sorted.zipWithIndex.map { case (id, k) =>
          (id, shard, 100L * k, (100L * k) / 256, 100L) }
      }.sortBy(_._1)
    assert(out.toSeq == expected)
  }

  test("t14: classifier logit matches an independent MessageDigest re-derivation") {
    // Re-derive the hashed-feature weight with java.security.MessageDigest
    // (independent of Spark's md5 expression) and the same int64 chain.
    def wt(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 4096L *
        2654435761L + 40503L) % 2003L - 1001L
    }
    val texts = Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "the quick brown fox jumps", "en"),
      (3L, "", "en")) // empty text: n_toks 0, logit 0, score 0.0
    val dir = writeDocs(texts, "t14")

    val out = SparkEntry.queries("t14_quality_classifier")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    val exp = texts.map { case (id, text, _) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val logit = toks.map(wt).sum
      (id, toks.length.toLong, logit,
        if (toks.nonEmpty) logit.toDouble / toks.length else 0.0,
        if (logit >= 0) 1 else 0)
    }
    assert(out.toSeq == exp)
    // the planted corpus must exercise both sides of the threshold
    assert(exp.map(_._5).toSet == Set(0, 1))
  }

  test("d14: DSIR scores rank the target-like candidate first, exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d14").toString
    val rows = Seq(
      // the target domain (src0): apple/banana/cherry language
      (100L, "apple banana apple cherry", "src0"),
      (101L, "banana cherry apple", "src0"),
      // candidates: 1 speaks pure target vocab, 2 pure foreign, 3 mixed
      (1L, "apple banana cherry", "src1"),
      (2L, "dog cat mouse", "src1"),
      (3L, "apple dog", "src2"))
    rows.toDF("doc_id", "text", "source").write.parquet(s"$dir/documents.parquet")

    // independent re-derivation: Laplace-smoothed bit-length surprisals
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val all = rows.flatMap { case (id, t, s) =>
      t.split(" ").filter(_.nonEmpty).map(tok => (id, s, tok)) }
    val vocab = all.map(_._3).distinct
    val cntT = vocab.map(t => t -> all.count(r => r._2 == "src0" && r._3 == t)).toMap
    val cntR = vocab.map(t => t -> all.count(r => r._2 != "src0" && r._3 == t)).toMap
    val (tt, tr, v) = (cntT.values.sum.toLong, cntR.values.sum.toLong, vocab.size.toLong)
    def delta(tok: String): Long =
      bits((tr + v) / (cntR(tok) + 1)) - bits((tt + v) / (cntT(tok) + 1))
    val exp = all.filter(_._2 != "src0").groupBy(_._1)
      .map { case (id, rs) => (id, rs.size.toLong, rs.map(r => delta(r._3)).sum) }
      .toSeq.sortBy { case (id, _, sc) => (-sc, id) }

    val out = SparkEntry.queries("d14_dsir_select")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == exp)
    // the pure-target candidate outranks the pure-foreign one
    val byId = out.map(r => r._1 -> r._3).toMap
    assert(byId(1L) > byId(2L))
  }

  test("t15: keep-first line dedup reconstructs docs in order; empty docs drop") {
    val dir = writeDocs(Seq(
      // doc 1 owns the shared line's first occurrence and keeps both lines
      (1L, "shared line\nunique a", "en"),
      // doc 2 loses the shared line, keeps its unique one
      (2L, "shared line\nunique b", "en"),
      // doc 3 is ONLY the shared line -> loses everything -> dropped
      (3L, "shared line", "en"),
      // doc 4 pins reconstruction order: idx order, not lexicographic
      (4L, "z line\na line", "en")), "t15")

    val out = SparkEntry.queries("t15_line_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, "shared line\nunique a"),
      (2L, 2L, 1L, "unique b"),
      (4L, 2L, 2L, "z line\na line")))
  }

  test("x13 equals the cell-grouped composition of the three gate queries") {
    def wt(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 4096L *
        2654435761L + 40503L) % 2003L - 1001L
    }
    val pos = (0 until 100).map(i => s"tok$i").find(wt(_) > 0).get
    val neg = (0 until 100).map(i => s"tok$i").find(wt(_) < 0).get
    val dir = writeDocs(Seq(
      // long prose with stopwords: heuristic + rules pass
      (1L, "the quick brown foxes jumped over lazy dogs while many other " +
        "small animals watched from of green field near town", "en"),
      // bullet lines: the rule table drops it, the heuristic doesn't care
      (2L, (1 to 20).map(i => s"- item$i").mkString("\n"), "en"),
      // 3 tokens: both structural gates fail
      (3L, "a b c", "en"),
      // no stopwords (rules fail) but sign-controlled classifier outcomes
      (4L, Seq.fill(25)(pos).mkString(" "), "en"),
      (5L, Seq.fill(25)(neg).mkString(" "), "en")), "x13")

    // derive each doc's three flags from the ALREADY-PROVEN per-gate
    // queries, then group — x13's claim is exactly this composition
    val heur = SparkEntry.queries("t2_quality_score")(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.getDouble(4) >= 0.7) 1 else 0)).toMap
    val rules = SparkEntry.queries("t12_gopher_rules")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("pass")).toMap
    val model = SparkEntry.queries("t14_quality_classifier")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("keep_flag"), r.getAs[Long]("n_toks")))).toMap
    val exp = heur.keys.toSeq
      .map(id => ((heur(id), rules(id), model(id)._1), model(id)._2))
      .groupBy(_._1).toSeq
      .map { case ((h, ru, mo), g) =>
        (h, ru, mo, g.size.toLong, g.map(_._2).sum) }
      .sortBy { case (h, ru, mo, _, _) => (h, ru, mo) }

    val out = SparkEntry.queries("x13_gate_agreement")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == exp)
    // the planted corpus must spread over several cells (gates disagree)
    assert(out.length >= 3, s"degenerate agreement matrix: ${out.toSeq}")
    assert(rules(2L) == 0 && heur(2L) == 1) // bullets split the gates
  }

  test("ShardSink: written shards match the portable hash and round-trip") {
    import spark.implicits._
    import graft.operators.ShardSink
    val docs = (0L until 40L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_shards").toString + "/out"

    val manifest = ShardSink.writeTrainingShards(docs, "doc_id", path, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val expected = (0L until 40L).groupBy(i => ShardSink.sampleHash(i) % 4)
      .map { case (s, ids) => (s.toInt, ids.size.toLong) }.toSeq.sorted
    assert(manifest.toSeq == expected)

    // read-back: every row kept its text and sits in its hash's shard
    val back = spark.read.parquet(path)
      .select("doc_id", "text", "shard_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(back.length == 40)
    assert(back.forall { case (id, text, s) =>
      text == s"doc number $id" && s == (ShardSink.sampleHash(id) % 4).toInt })

    // determinism: a second write of the same frame lands identically
    val manifest2 = ShardSink.writeTrainingShards(docs, "doc_id", path, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(manifest2.toSeq == manifest.toSeq)
  }

  test("packed-sequence sink: offsets are the shard-local running sum; packs floor-divide") {
    import spark.implicits._
    import graft.operators.ShardSink
    val path = java.nio.file.Files.createTempDirectory("graft_pack").toString + "/packs"
    // doc i carries (i % 5) + 1 tokens, so offsets and pack boundaries
    // are hand-replayable below
    val docs = (0L until 10L).map(i =>
      (i, (0 to (i % 5).toInt).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val manifest = ShardSink
      .writePackedSequences(docs, "doc_id", "text", path, 2, 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // replay the layout law: per shard, id-sorted running token sum
    val law = (0L until 10L).map(i => (i, (i % 5) + 1))
      .groupBy { case (i, _) => (ShardSink.sampleHash(i) % 2).toInt }
    val expManifest = law.map { case (s, ds) =>
      val sorted = ds.sortBy(_._1)
      val offs = sorted.map(_._2).scanLeft(0L)(_ + _).init
      (s, sorted.size.toLong, offs.map(_ / 8).distinct.size.toLong,
        sorted.map(_._2).sum)
    }.toSeq.sorted
    assert(manifest.toSeq.sorted == expManifest)

    // read-back: every row's offset and pack match the replay
    val back = spark.read.parquet(path)
      .select("doc_id", "tok_offset", "pack_id", "shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val expRows = law.flatMap { case (s, ds) =>
      val sorted = ds.sortBy(_._1)
      val offs = sorted.map(_._2).scanLeft(0L)(_ + _).init
      sorted.zip(offs).map { case ((i, _), o) => (i, o, o / 8, s) }
    }.toSet
    assert(back.toSet == expRows)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d17_hll_cardinality / t16_bigram_surprisal / d18_cdc_chunks: each
  * checked by a FULL independent Scala re-derivation (MessageDigest md5,
  * BigInt-free integer arithmetic, brute-force window hashing) on planted
  * corpora, plus the law each operator exists for — HLL's estimate
  * tracking the exact cardinality, the bigram LM ranking deterministic
  * continuations as unsurprising, and CDC boundaries resynchronizing
  * after an insertion (the property fixed-size blocks lack).
  */
class SketchLmCdcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeDocs(rows: Seq[(Long, String, String)], tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    rows.toDF("doc_id", "text", "lang").write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(tok: String): Long =
    java.lang.Long.parseLong(md5hex(tok).take(15), 16)

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq

  // ---------------------------------------------------------------- d17

  /** The operator's register/harmonic-sum arithmetic, re-derived. */
  private def hllDerive(tokens: Seq[String]): (Long, Long, Double) = {
    val regs = new Array[Long](64)
    tokens.foreach { t =>
      val hv = h60(t)
      val j = (hv % 64).toInt
      val v = hv / 64
      val rho = if (v == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(v))
      if (rho > regs(j)) regs(j) = rho
    }
    val vZero = regs.count(_ == 0L).toLong
    val s = regs.map(m => if (m <= 54) 1L << (54 - m).toInt else 0L).sum
    val est = 0.709 * 4096 * 18014398509481984L.toDouble / s
    (vZero, s, est)
  }

  test("d17: registers, harmonic sum and estimate equal the re-derivation") {
    val dir = writeDocs(Seq(
      (1L, "alpha beta gamma delta alpha", "en"),
      (2L, "beta epsilon zeta", "en"),
      (3L, "un deux trois deux", "fr")), "d17")
    val out = SparkEntry.queries("d17_hll_cardinality")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    val en = hllDerive(toks("alpha beta gamma delta alpha") ++ toks("beta epsilon zeta"))
    val fr = hllDerive(toks("un deux trois deux"))
    assert(out("en") == ((8L, 6L, en._1, en._2, en._3)))
    assert(out("fr") == ((4L, 3L, fr._1, fr._2, fr._3)))
  }

  test("d17: the estimate tracks the exact cardinality (m=64 error band)") {
    // 300 distinct tokens spread over 40 docs; HLL(m=64) relative error
    // ~1.04/sqrt(64) = 13%, so 40% is a generous but meaningful band
    val docs = (0 until 40).map { i =>
      ((i + 1).toLong,
        (0 until 300).filter(_ % 40 == i).map(k => s"tok$k").mkString(" "), "en")
    }
    val dir = writeDocs(docs, "d17b")
    val r = SparkEntry.queries("d17_hll_cardinality")(spark, dir).collect().head
    assert(r.getLong(2) == 300L) // n_distinct_exact
    val est = r.getDouble(5)
    assert(est > 180 && est < 420, s"HLL estimate $est out of band for 300")
  }

  // ---------------------------------------------------------------- t16

  /** Full independent re-derivation of the interpolated bigram scorer. */
  private def bigramDerive(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val ts = docs.map { case (id, t) => id -> toks(t) }
    val allToks = ts.flatMap(_._2)
    val tTotal = allToks.size.toLong
    val c2 = allToks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bgs = ts.flatMap { case (id, tk) => tk.sliding(2).filter(_.size == 2)
      .map(p => (id, p(0), p(1))).toSeq }
    val c12 = bgs.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.size.toLong }
    val c1 = bgs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    bgs.groupBy(_._1).map { case (id, bs) =>
      val bits = bs.map { case (_, w1, w2) =>
        val num = 7L * c12((w1, w2)) * tTotal + 3L * c2(w2) * c1(w1)
        val den = 10L * c1(w1) * tTotal
        (64 - java.lang.Long.numberOfLeadingZeros(den / num)).toLong
      }
      id -> (bits.size.toLong, bits.sum)
    }
  }

  test("t16: per-doc bigram surprisal equals the re-derivation") {
    val docs = Seq(
      (1L, "x a x b x c x d x e"),    // history x fans out: surprising continuations
      (2L, "p q p q p q p q"),        // deterministic continuation: unsurprising
      (3L, "filler one two three four five six seven eight nine"),
      (4L, "lone"))                   // single token: no bigrams, absent from output
    val dir = writeDocs(docs.map(d => (d._1, d._2, "en")), "t16")
    val out = SparkEntry.queries("t16_bigram_surprisal")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = bigramDerive(docs)
    assert(out == exp)
    assert(!out.contains(4L))
  }

  test("t16: deterministic continuations score below fanned-out histories") {
    val dir = writeDocs(Seq(
      (1L, "x a x b x c x d x e", "en"),
      (2L, "p q p q p q p q", "en"),
      (3L, "filler one two three four five six seven eight nine", "en")), "t16b")
    val rows = SparkEntry.queries("t16_bigram_surprisal")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(2L) < rows(1L),
      s"repeated bigram doc must be less surprising: ${rows(2L)} vs ${rows(1L)}")
  }

  // ---------------------------------------------------------------- d18

  private def bruteWindowHashes(s: String, w: Int): Seq[Long] = {
    val cps = s.codePoints.toArray
    (w to cps.length).map { i =>
      cps.slice(i - w, i).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    }
  }

  test("window_hashes kernel equals the brute-force per-window hash") {
    val rnd = new scala.util.Random(42)
    val samples = Seq(
      "", "a", "abcdefg", "abcdefgh",
      (1 to 500).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString,
      "héllo wörld ünïcode — ™ 𝄞 mixed ascii and multibyte text here") ++
      (1 to 10).map(_ => (1 to 50 + rnd.nextInt(200))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    for (s <- samples; w <- Seq(1, 4, 8, 16)) {
      val got = graft.functions.WindowHashes
        .compute(UTF8String.fromString(s), w)
      val gotSeq = (0 until got.numElements()).map(got.getLong)
      assert(gotSeq == bruteWindowHashes(s, w), s"w=$w len=${s.length}")
    }
  }

  test("window_hashes is total on malformed UTF-8 (ADVICE r7)") {
    // parquet strings are not validated UTF-8; d18 runs the kernel over
    // every document, so the kernel must be a total function on dirty
    // bytes. Cases: truncated multibyte lead MID-string followed by more
    // bytes (decodes MORE codepoints than UTF8String.numChars — used to
    // write past the output array), stray continuation bytes (decode
    // FEWER — used to leave silent trailing zeros), and a dangling lead
    // at the very end (the documented total-function clause).
    def rawHashes(bytes: Array[Byte], w: Int): Seq[Long] = {
      val got = graft.functions.WindowHashes
        .compute(UTF8String.fromBytes(bytes), w)
      (0 until got.numElements()).map(got.getLong)
    }
    // decode with the kernel's own rule to derive the expected hashes
    def decode(b: Array[Byte]): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < b.length) {
        val x = b(i) & 0xFF
        val need = if (x < 0x80) 1 else if (x < 0xE0) 2 else if (x < 0xF0) 3 else 4
        if (need > b.length - i) { out += x; i += 1 }
        else {
          out += (need match {
            case 1 => x
            case 2 => ((x & 0x1F) << 6) | (b(i + 1) & 0x3F)
            case 3 => ((x & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
            case _ => ((x & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
              ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
          })
          i += need
        }
      }
      out.toSeq
    }
    val cases = Seq(
      Array(0x61, 0x62, 0x63, 0xE0, 0x64).map(_.toByte),       // truncated 3-byte lead mid-string
      Array(0x61, 0xF0, 0x62, 0x63, 0x64, 0x65).map(_.toByte), // truncated 4-byte lead mid-string
      Array(0x80, 0x81, 0x61, 0x62, 0x63).map(_.toByte),       // stray continuation bytes
      Array(0x61, 0x62, 0x80, 0x63, 0x80, 0x80, 0x64).map(_.toByte),
      Array(0x61, 0x62, 0x63, 0x64, 0xE0).map(_.toByte),       // dangling lead at end
      Array(0xC0, 0xC1, 0xF5, 0xFF, 0x61).map(_.toByte))       // overlong/invalid leads
    for (bytes <- cases; w <- Seq(1, 2, 4, 8)) {
      val cps = decode(bytes)
      val expected = (w to cps.length).map { i =>
        cps.slice(i - w, i).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
      }
      assert(rawHashes(bytes, w) == expected,
        s"w=$w bytes=${bytes.map(b => f"${b & 0xFF}%02x").mkString(" ")}")
    }
  }

  test("window_hashes(w=n over whole text) agrees with rolling_hash on dirty bytes") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val bytes = Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(256).toByte)
      val s = UTF8String.fromBytes(bytes)
      val rh = graft.functions.RollingHash.compute(s)
      // find the kernel's codepoint count via w=1 output length
      val w1 = graft.functions.WindowHashes.compute(s, 1)
      val n = w1.numElements()
      if (n > 0) {
        val whole = graft.functions.WindowHashes.compute(s, n)
        assert(whole.numElements() == 1)
        assert(whole.getLong(0) == rh,
          s"kernels disagree on bytes=${bytes.map(b => f"${b & 0xFF}%02x").mkString(" ")}")
      }
    }
  }

  /** The operator's chunking + keep-first dedup, re-derived. */
  private def cdcDerive(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val chunks = docs.flatMap { case (id, text) =>
      val n = text.codePointCount(0, text.length)
      val wh = bruteWindowHashes(text, 8)
      val cuts = wh.zipWithIndex.collect {
        case (h, i) if h % 64 == 0 && (i + 8).toLong < n => (i + 8).toLong
      }
      val starts = 1L +: cuts.map(_ + 1)
      val ends = cuts :+ n.toLong
      starts.zip(ends).map { case (st, en) =>
        // planted texts are ASCII (or BMP): String.substring by char index
        val chunk = text.substring(st.toInt - 1, en.toInt)
        (id, st, en - st + 1, java.lang.Long.parseLong(md5hex(chunk).take(15), 16))
      }
    }
    val firstOwner = chunks.groupBy(_._4)
      .map { case (dg, occ) => dg -> occ.map(o => (o._1, o._2)).min }
    chunks.groupBy(_._1).map { case (id, cs) =>
      val dups = cs.filter(c => firstOwner(c._4) != ((c._1, c._2)))
      id -> (cs.size.toLong, dups.size.toLong, dups.map(_._3).sum)
    }
  }

  private def mkText(seed: Int, words: Int): String =
    (1 to words).map(i => s"w${(i.toLong * 2654435761L + seed) % 97}").mkString(" ")

  test("d18: chunk counts and dedup accounting equal the re-derivation") {
    val docs = Seq(
      (1L, mkText(1, 300)),
      (2L, "INSERTED PREFIX " + mkText(1, 300)), // shifted copy of doc 1
      (3L, mkText(2, 150)))
    val dir = writeDocs(docs.map(d => (d._1, d._2, "en")), "d18")
    val out = SparkEntry.queries("d18_cdc_chunks")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == cdcDerive(docs))
  }

  test("d18: boundaries resynchronize after an insertion (the CDC property)") {
    val base = mkText(7, 400)
    val docs = Seq((1L, base), (2L, "X " + base))
    val dir = writeDocs(docs.map(d => (d._1, d._2, "en")), "d18b")
    val out = SparkEntry.queries("d18_cdc_chunks")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (n2, dup2, dupChars2) = out(2L)
    // the 2-char insertion shifts every byte of doc 2, yet all chunks
    // beyond the first boundary hash identically to doc 1's — only the
    // head chunk (and possibly its successor) fails to dedupe
    assert(n2 >= 4, s"need several chunks for the law to bite, got $n2")
    assert(dup2 >= n2 - 2, s"CDC must resync: $dup2 of $n2 chunks deduped")
    assert(dupChars2 > base.length * 0.5,
      s"most of the shifted copy must dedupe, got $dupChars2 of ${base.length}")
  }

  // --------------------------------------------------------------- d18b

  /** Independent sequential FastCDC reference: walk the candidate list
    * one boundary at a time — skip candidates closer than MIN to the
    * previous boundary, force a cut at prev+MAX when no candidate lands
    * in (prev+MIN-1, prev+MAX]. Deliberately a plain imperative loop (the
    * textbook formulation) so it shares no structure with the query's
    * arithmetic fold or the oracle's recursive CTE.
    */
  private def boundedCuts(n: Long, cands: Seq[Long], min: Long, max: Long): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prev = 0L
    var rest = cands
    var done = false
    while (!done) {
      rest = rest.dropWhile(_ < prev + min)
      rest.headOption.filter(_ <= prev + max) match {
        case Some(c) => out += c; prev = c
        case None =>
          if (n - prev > max) { out += prev + max; prev = prev + max }
          else done = true
      }
    }
    out.toSeq
  }

  private def cdcBoundedDerive(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    val chunks = docs.flatMap { case (id, text) =>
      val n = text.codePointCount(0, text.length).toLong
      val wh = bruteWindowHashes(text, 8)
      val cands = wh.zipWithIndex.collect {
        case (h, i) if h % 64 == 0 && (i + 8).toLong < n => (i + 8).toLong
      }
      val cuts = boundedCuts(n, cands, 16L, 192L)
      val starts = 1L +: cuts.map(_ + 1)
      val ends = cuts :+ n
      starts.zip(ends).map { case (st, en) =>
        val chunk = text.substring(st.toInt - 1, en.toInt)
        (id, st, en - st + 1, java.lang.Long.parseLong(md5hex(chunk).take(15), 16))
      }
    }
    val firstOwner = chunks.groupBy(_._4)
      .map { case (dg, occ) => dg -> occ.map(o => (o._1, o._2)).min }
    chunks.groupBy(_._1).map { case (id, cs) =>
      val dups = cs.filter(c => firstOwner(c._4) != ((c._1, c._2)))
      id -> (cs.size.toLong, cs.map(_._3).min, cs.map(_._3).max,
        dups.size.toLong, dups.map(_._3).sum)
    }
  }

  test("d18b: bounded chunks equal the sequential FastCDC reference") {
    val docs = Seq(
      (1L, mkText(1, 300)),
      (2L, "INSERTED PREFIX " + mkText(1, 300)),
      (3L, mkText(2, 150)),
      (4L, mkText(3, 4)),            // shorter than MIN: one tail chunk
      (5L, "z" * 700))               // no candidates at all: forced cuts only
    val dir = writeDocs(docs.map(d => (d._1, d._2, "en")), "d18b_ref")
    val out = SparkEntry.queries("d18b_cdc_bounded")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out == cdcBoundedDerive(docs))
    // the all-same-char doc must be pure forced cuts: ceil(700/192) chunks
    assert(out(5L)._1 == 4L && out(5L)._3 == 192L,
      s"forced-cut-only doc must chunk at MAX, got ${out(5L)}")
  }

  test("d18b: chunk lengths obey the FastCDC bounds law") {
    val docs = (1L to 12L).map(i => (i, mkText(i.toInt * 31, 200 + 40 * i.toInt)))
    // the law, checked on the per-chunk reference the query is verified
    // against below: every chunk <= MAX, and every chunk EXCEPT the final
    // tail >= MIN (the tail alone may undershoot)
    docs.foreach { case (id, text) =>
      val n = text.codePointCount(0, text.length).toLong
      val cands = bruteWindowHashes(text, 8).zipWithIndex.collect {
        case (h, i) if h % 64 == 0 && (i + 8).toLong < n => (i + 8).toLong
      }
      val cuts = boundedCuts(n, cands, 16L, 192L)
      val lens = ((1L +: cuts.map(_ + 1)).zip(cuts :+ n))
        .map { case (st, en) => en - st + 1 }
      assert(lens.forall(_ <= 192L), s"doc $id: chunk exceeds MAX in $lens")
      assert(lens.dropRight(1).forall(_ >= 16L),
        s"doc $id: non-tail chunk under MIN in $lens")
      assert(lens.forall(_ >= 1L), s"doc $id: empty chunk in $lens")
    }
    // and the query agrees with that reference (bounds + dedup accounting)
    val dir = writeDocs(docs.map(d => (d._1, d._2, "en")), "d18b_law")
    val got = SparkEntry.queries("d18b_cdc_bounded")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == cdcBoundedDerive(docs))
  }

  test("d18b: bounded boundaries still resynchronize after an insertion") {
    val base = mkText(7, 400)
    val docs = Seq((1L, base), (2L, "X " + base))
    val dir = writeDocs(docs.map(d => (d._1, d._2, "en")), "d18b_resync")
    val out = SparkEntry.queries("d18b_cdc_bounded")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4), r.getLong(5))).toMap
    val (n2, dup2, dupChars2) = out(2L)
    assert(n2 >= 4, s"need several chunks for the law to bite, got $n2")
    assert(dup2 >= n2 - 2, s"bounded CDC must resync: $dup2 of $n2 chunks deduped")
    assert(dupChars2 > base.length * 0.5,
      s"most of the shifted copy must dedupe, got $dupChars2 of ${base.length}")
  }

  // --------------------------------------------------------------- d19

  /** An adversarial stream for a k-counter summary: a few genuinely
    * heavy tokens drowned in a rotating parade of k distinct light
    * tokens, which keeps all slots contended and forces constant
    * decrements — the regime where a buggy eviction loses a heavy token.
    */
  private def mgStream(k: Int): (Seq[String], Map[String, Long]) = {
    val heavy = Seq("alpha", "beta", "gamma")
    val s = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < 2000) {
      heavy.foreach(s += _)
      s += s"light${i % (k + 5)}" // rotating light tokens, > k distinct
      i += 1
    }
    val exact = s.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    (s.toSeq, exact)
  }

  test("d19: MG counters obey the N/(k+1) error band on a sequential stream") {
    val k = 8
    val (stream, exact) = mgStream(k)
    val agg = graft.functions.MisraGries.aggregator(k)
    val summary = stream.foldLeft(agg.zero)(agg.reduce)
    val n = stream.size.toLong
    assert(summary.size <= k, s"summary must hold <= $k counters")
    summary.foreach { case (tok, cnt) =>
      val truth = exact(tok)
      assert(cnt <= truth, s"$tok: MG must undercount ($cnt > $truth)")
      assert(cnt >= truth - n / (k + 1),
        s"$tok: undercount beyond N/(k+1) ($cnt < $truth - ${n / (k + 1)})")
    }
    // the law with teeth: every token above N/(k+1) MUST be present
    exact.filter(_._2 > n / (k + 1)).keys.foreach { tok =>
      assert(summary.contains(tok), s"guaranteed-heavy token $tok evicted")
    }
  }

  test("d19: merged partial summaries keep the guarantee (mergeable-summaries law)") {
    val k = 8
    val (stream, exact) = mgStream(k)
    val n = stream.size.toLong
    val agg = graft.functions.MisraGries.aggregator(k)
    // split into uneven chunks, fold each, then merge in two different
    // association orders — both must keep the bound and the heavy set
    val chunks = stream.grouped(317).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val leftFold = chunks.reduceLeft(agg.merge)
    val rightFold = chunks.reduceRight(agg.merge)
    for ((summary, tag) <- Seq((leftFold, "left"), (rightFold, "right"))) {
      assert(summary.size <= k)
      summary.foreach { case (tok, cnt) =>
        assert(cnt <= exact(tok), s"$tag/$tok overcounts")
        assert(cnt >= exact(tok) - n / (k + 1), s"$tag/$tok undercount beyond bound")
      }
      exact.filter(_._2 > n / (k + 1)).keys.foreach { tok =>
        assert(summary.contains(tok), s"$tag: guaranteed-heavy token $tok evicted")
      }
    }
  }

  // ----------------------------------------------------------- d20/d21

  test("d20: count-min cells and estimates equal the brute-force sketch; est >= true") {
    val docs = Seq(
      (1L, "apple banana apple cherry date"),
      (2L, "banana banana elder fig grape"),
      (3L, "apple cherry cherry honey iris"))
    val dir = writeDocs(docs.map(d => (d._1, d._2, "en")), "d20")
    val out = SparkEntry.queries("d20_count_min")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent sketch: same md5 row hashes, plain Scala fold
    val toks = docs.flatMap(_._2.split(" "))
    def cellOf(r: Int, tok: String): Long =
      java.lang.Long.parseLong(md5hex(s"$r:$tok").take(15), 16) % 32
    val cells = toks.flatMap(t => (0 until 4).map(r => (r, cellOf(r, t))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = exact.keys.toSeq.sorted.map { t =>
      val est = (0 until 4).map(r => cells((r, cellOf(r, t)))).min
      (t, est, exact(t), est - exact(t))
    }
    assert(out.toSeq == want)
    out.foreach { case (t, est, cnt, over) =>
      assert(est >= cnt && over == est - cnt, s"CMS law broken for $t")
    }
  }

  test("d21: bloom decontamination never misses a contaminated doc; exact side is exact") {
    // doc 17 is the eval doc; doc 3 copies a 6-gram window from it
    val evalText = (1 to 20).map(i => s"ev$i").mkString(" ")
    val docs = Seq(
      (17L, evalText),
      (1L, (1 to 15).map(i => s"a$i").mkString(" ")),
      (3L, "x1 x2 " + (5 to 10).map(i => s"ev$i").mkString(" ") + " x3 x4"),
      (4L, (1 to 12).map(i => s"b$i").mkString(" ")),
      // short docs (< 6 tokens / empty) yield ZERO grams, not a crash:
      // sequence(1, 0) in Spark DESCENDS, so the guard must be an IF
      (6L, "hello world"),
      (8L, ""))
    val dir = writeDocs(docs.map(d => (d._1, d._2, "en")), "d21")
    val out = SparkEntry.queries("d21_bloom_decontaminate")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5))).toMap
    assert(out.keySet == Set(1L, 3L, 4L, 6L, 8L))
    // gram-less docs appear with zero counts and no flags
    for (id <- Seq(6L, 8L)) assert(out(id) == ((0L, 0L, 0L, 0, 0)), s"doc $id")
    // doc 3 holds exactly one eval 6-gram (ev5..ev10); flag must fire
    val (n3, bloom3, exact3, fb3, ic3) = out(3L)
    assert(exact3 == 1L && ic3 == 1, s"doc 3 exact contamination: ${out(3L)}")
    assert(bloom3 >= exact3 && fb3 == 1, s"bloom must not miss doc 3: ${out(3L)}")
    // the no-false-negative law holds row-wise everywhere
    out.foreach { case (id, (_, bloom, exact, fb, ic)) =>
      assert(bloom >= exact, s"doc $id: bloom_hits < exact_hits")
      assert(fb >= ic, s"doc $id: flagged_bloom < is_contaminated")
    }
    // gram counts: len(ts) - 5 windows
    assert(out(1L)._1 == 10L && out(3L)._1 == 5L && out(4L)._1 == 7L)
  }

  test("d19: the query equals exact heavy hitters on a planted corpus") {
    // per-lang corpora where the heavy set is known: "hot" appears in
    // every doc 3x, "warm" 2x, the rest are unique fillers
    val mk = (id: Long, lang: String) =>
      (id, s"hot hot hot warm warm u${id}a u${id}b u${id}c u${id}d", lang)
    val rows = (1L to 40L).map(i => mk(i, if (i % 2 == 0) "en" else "de"))
    val dir = writeDocs(rows, "d19")
    val out = SparkEntry.queries("d19_heavy_hitters")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // per lang: N = 20 docs x 9 toks = 180; threshold N/30 = 6; exact
    // counts: hot = 60 > 6, warm = 40 > 6, fillers = 1 each
    val want = Seq(("de", "hot", 60L, 180L), ("de", "warm", 40L, 180L),
      ("en", "hot", 60L, 180L), ("en", "warm", 40L, 180L))
    assert(out.toSeq == want)
  }
}

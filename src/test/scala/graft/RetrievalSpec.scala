package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d15_bm25_topk / x12_hybrid_retrieval over a planted corpus, checked
  * against a COMPLETE independent re-derivation in plain Scala (MessageDigest
  * md5, integer bit-lengths, IEEE doubles) — the same double-entry pattern as
  * MixDecontamSpec's d14 test. The planted corpus makes the retrieval laws
  * visible: a rare shared term outranks common ones (IDF), and the hybrid
  * fusion surfaces a dense-only neighbour the lexical leg can't see.
  */
class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // every fixture dir is registered here and deleted in afterAll — the
  // suite used to leak one temp dir per test run (ADVICE r13)
  private val tempDirs = scala.collection.mutable.ListBuffer.empty[String]

  private def tempDir(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    tempDirs.synchronized(tempDirs += dir)
    dir
  }

  override def afterAll(): Unit = {
    spark.stop()
    tempDirs.foreach(d =>
      graft.operators.Scratch.deleteRecursively(new java.io.File(d)))
  }

  // train docs 1-3, eval docs 7 and 17 (doc_id % 10 == 7)
  private val corpus = Seq(
    (1L, "zebra common common common"),
    (2L, "apple common words here"),
    (3L, "common words other things"),
    (7L, "zebra apple apple"),
    (17L, "common"))

  private def writeCorpus(tag: String): String = {
    import spark.implicits._
    val dir = tempDir(tag)
    corpus.map { case (id, t) => (id, t, "en", s"src$id") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(t: String): Seq[String] =
    t.split(" ").filter(_.nonEmpty).toSeq

  private def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong

  /** Independent BM25: (qdoc, doc, fixed-point score). */
  private def bm25(): Map[(Long, Long), Long] = {
    val train = corpus.filter(_._1 % 10 != 7)
    val tf = train.flatMap { case (id, t) => toks(t).map(id -> _) }
      .groupBy(identity).map { case ((id, tm), g) => (id, tm, g.size.toLong) }
    val dl = train.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val df = tf.groupBy(_._2).map { case (tm, g) => tm -> g.size.toLong }
    val bigL = dl.values.sum
    val nd = dl.size.toLong
    val out = for {
      (qid, qt) <- corpus.filter(_._1 % 10 == 7)
      term <- toks(qt).distinct
      (did, tm, f) <- tf if tm == term
    } yield {
      val idf = bits(nd / df(term))
      val contrib = math.floor(
        (idf * f * 44L * bigL).toDouble /
          (20L * bigL * f + 6L * bigL + 18L * dl(did) * nd) * 1000000 + 0.5).toLong
      ((qid, did), contrib)
    }
    out.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
  }

  /** Independent doc embedding: x11/x12's md5 projection. */
  private def embed(t: String): Array[Long] = {
    def fid(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1000003L
    }
    val fids = toks(t).map(fid)
    Array.tabulate(16) { j =>
      fids.map(f => (f * 2654435761L + j * 97003999L) % 2003L - 1001L).sum
    }
  }

  test("d15: BM25 output equals the independent re-derivation; rare term ranks first") {
    val dir = writeCorpus("d15")
    val out = SparkEntry.queries("d15_bm25_topk")(spark, dir).collect()
      .map(r => (r.getAs[Long]("qdoc"), r.getAs[Int]("rk"),
        r.getAs[Long]("r_doc"), r.getAs[Double]("bm25")))

    val exp = bm25().toSeq
      .groupBy(_._1._1)
      .flatMap { case (q, rows) =>
        rows.sortBy { case ((_, did), sc) => (-sc, did) }.take(5).zipWithIndex
          .map { case (((_, did), sc), i) => (q, i + 1, did, sc.toDouble / 1000000) }
      }.toSeq.sortBy(r => (r._1, r._2))
    assert(out.toSeq == exp)

    // the IDF law: for query 7 the zebra doc (rare term) outranks the
    // apple doc even though doc 2 is shorter
    val q7 = out.filter(_._1 == 7L)
    assert(q7.head._3 == 1L, s"zebra doc must rank first for q7: ${q7.toSeq}")
    // query 17's only term is corpus-wide: idf = bits(3 div 3) = 1 for
    // every candidate; all three train docs still score (recall floor)
    assert(out.count(_._1 == 17L) == 3)
  }

  test("d15: hot-term pruning (graft.bm25.maxDfFrac) keeps the top-k head stable") {
    import spark.implicits._
    // planted so the stop word is rank-NEUTRAL: "the" appears once in
    // every train doc and every train doc has the same dl, so its
    // contribution is one constant c for all candidates — pruning it
    // shifts every matching doc's score by exactly c and cannot reorder
    val docs = Seq(
      (1L, "the zebra zebra pear"),
      (2L, "the apple pear kiwi"),
      (3L, "the kiwi kiwi kiwi"),
      (7L, "the zebra apple"),   // query: stop word + two discriminative
      (17L, "the"))              // query made ENTIRELY of the stop word
    val dir = tempDir("d15prune")
    docs.map { case (id, t) => (id, t, "en", s"src$id") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")

    def run(): Map[Long, Seq[(Long, Double)]] =
      SparkEntry.queries("d15_bm25_topk")(spark, dir).collect()
        .map(r => (r.getAs[Long]("qdoc"), r.getAs[Long]("r_doc"),
          r.getAs[Double]("bm25")))
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap

    val full = run()
    spark.conf.set("graft.bm25.maxDfFrac", "0.9")
    val pruned = try run() finally spark.conf.unset("graft.bm25.maxDfFrac")

    // df("the") = 3 = Nd > 0.9·Nd → pruned; every other term df ≤ 2/3·Nd
    // q7 unpruned candidates: docs 1,2 (real terms) + doc 3 (stop word
    // only). Pruned: doc 3 — a stop-word-only match — drops; the
    // surviving head keeps its exact order
    val fullQ7 = full(7L)
    val prunedQ7 = pruned(7L)
    assert(fullQ7.map(_._1) == Seq(1L, 2L, 3L), s"unpruned q7: $fullQ7")
    assert(prunedQ7.map(_._1) == Seq(1L, 2L), s"pruned q7: $prunedQ7")
    // the shift is exactly the stop word's constant contribution — which
    // IS doc 3's whole unpruned score
    val c = fullQ7.find(_._1 == 3L).get._2
    prunedQ7.foreach { case (did, sc) =>
      val before = fullQ7.find(_._1 == did).get._2
      assert(math.abs((before - sc) - c) < 1e-9,
        s"doc $did: pruning must subtract exactly c=$c (was $before, now $sc)")
    }
    // a query made entirely of pruned terms returns no candidates —
    // the documented stop-word-only behavior
    assert(full.contains(17L) && !pruned.contains(17L))
  }

  test("x12: RRF fusion equals the integer law and surfaces a dense-only doc") {
    val dir = writeCorpus("x12")
    val out = SparkEntry.queries("x12_hybrid_retrieval")(spark, dir).collect()
      .map(r => (r.getAs[Long]("qdoc"), r.getAs[Int]("rk"), r.getAs[Long]("r_doc"),
        r.getAs[Long]("rrf"), r.getAs[Int]("lex_rk"), r.getAs[Int]("dense_rk")))

    // independent legs
    val lexRank: Map[(Long, Long), Int] = bm25().toSeq.groupBy(_._1._1)
      .flatMap { case (q, rows) =>
        rows.sortBy { case ((_, did), sc) => (-sc, did) }.take(5).zipWithIndex
          .map { case (((_, did), _), i) => (q, did) -> (i + 1) }
      }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum
      val nb = b.map(x => x * x).sum
      dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
    }
    val embs = corpus.map { case (id, t) => id -> embed(t) }.toMap
    val denseRank: Map[(Long, Long), Int] = corpus.filter(_._1 % 10 == 7)
      .flatMap { case (q, _) =>
        corpus.filter(_._1 % 10 != 7)
          .map { case (did, _) => (did, cos(embs(q), embs(did))) }
          .sortBy { case (did, c) => (-c, did) }.take(5).zipWithIndex
          .map { case ((did, _), i) => (q, did) -> (i + 1) }
      }.toMap
    val allPairs = (lexRank.keySet ++ denseRank.keySet).toSeq
    val exp = allPairs.map { case (q, did) =>
      val l = lexRank.getOrElse((q, did), 0)
      val de = denseRank.getOrElse((q, did), 0)
      val rrf = (if (l > 0) 1000000L / (60 + l) else 0L) +
        (if (de > 0) 1000000L / (60 + de) else 0L)
      (q, did, rrf, l, de)
    }.groupBy(_._1).flatMap { case (q, rows) =>
      rows.sortBy { case (_, did, rrf, _, _) => (-rrf, did) }.take(5).zipWithIndex
        .map { case ((_, did, rrf, l, de), i) => (q, i + 1, did, rrf, l, de) }
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(out.toSeq == exp)

    // the fusion law the composite exists for: doc 3 shares no term with
    // query 7 (invisible to BM25) but is still dense-ranked — it must
    // appear in q7's fused list with lex_rk = 0 and dense_rk > 0
    val d3 = out.find(r => r._1 == 7L && r._3 == 3L)
    assert(d3.isDefined, s"dense-only doc 3 missing from fusion: ${out.toSeq}")
    assert(d3.get._5 == 0 && d3.get._6 > 0)
  }

  test("x12c: IVF dense leg with full list coverage equals the exact leg (x12b)") {
    // the IVF law worth pinning structurally (the sf0.01 oracle already
    // re-derives the whole index in DuckDB): pruning only ever REMOVES
    // candidates outside the probed lists, so when every corpus doc's
    // list IS probed the leg degenerates to the exact brute force and
    // x12c must equal x12b row for row. 100 docs → centroids {0, 50}
    // (the stride-50 rule) → 2 inverted lists → every query's 2-probe
    // covers both → full coverage by construction.
    import spark.implicits._
    val words = Seq("zebra", "apple", "pear", "kiwi", "common", "words",
      "other", "things", "table", "river")
    val docs = (0L until 100L).map { id =>
      val t = (0 until 4 + (id % 5).toInt)
        .map(j => words(((id * 7 + j * 3) % 10).toInt)).mkString(" ")
      (id, t, "en", s"src$id")
    }
    val dir = tempDir("x12c")
    docs.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    def rows(name: String) =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getAs[Long]("qdoc"), r.getAs[Int]("rk"),
          r.getAs[Long]("r_doc"), r.getAs[Long]("rrf"),
          r.getAs[Int]("lex_rk"), r.getAs[Int]("dense_rk"))).toSeq
    val ivf = rows("x12c_hybrid_ivf")
    val exact = rows("x12b_hybrid_pruned")
    assert(ivf == exact,
      s"full-coverage IVF must equal exact dense leg:\nivf=$ivf\nexact=$exact")
    assert(ivf.nonEmpty && ivf.exists(_._6 > 0),
      "fixture must exercise the dense leg")
  }

  test("x12d: auto dispatch routes on the footer-pair boundary and defaults to the exact leg") {
    // the COVERAGE.md decision rule as code (r13): route exact while
    // |queries| × |corpus| ≤ graft.x12.maxExactDensePairs, IVF above.
    // 100 docs → 10 × 90 = 900 pairs: the boundary is pinned EXACTLY
    // (≤, not <) by straddling it with the conf — 900 stays exact,
    // 899 flips to IVF — and the default (1e8) resolves to the exact
    // leg, so x12d must equal x12b row for row on the same corpus.
    import spark.implicits._
    val words = Seq("zebra", "apple", "pear", "kiwi", "common", "words",
      "other", "things", "table", "river")
    val docs = (0L until 100L).map { id =>
      val t = (0 until 4 + (id % 5).toInt)
        .map(j => words(((id * 7 + j * 3) % 10).toInt)).mkString(" ")
      (id, t, "en", s"src$id")
    }
    val dir = tempDir("x12d")
    docs.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    assert(graft.operators.PipelineOps.denseLegAuto(spark, dir) == "exact",
      "default boundary (1e8 pairs) must keep a 900-pair corpus exact")
    try {
      spark.conf.set("graft.x12.maxExactDensePairs", "900")
      assert(graft.operators.PipelineOps.denseLegAuto(spark, dir) == "exact",
        "the boundary is inclusive: product == ceiling stays exact")
      spark.conf.set("graft.x12.maxExactDensePairs", "899")
      assert(graft.operators.PipelineOps.denseLegAuto(spark, dir) == "ivf",
        "one pair past the ceiling must route to the IVF leg")
      spark.conf.set("graft.x12.maxExactDensePairs", "bogus")
      intercept[IllegalArgumentException] {
        graft.operators.PipelineOps.denseLegAuto(spark, dir)
      }
    } finally spark.conf.unset("graft.x12.maxExactDensePairs")
    def rows(name: String) =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getAs[Long]("qdoc"), r.getAs[Int]("rk"),
          r.getAs[Long]("r_doc"), r.getAs[Long]("rrf"),
          r.getAs[Int]("lex_rk"), r.getAs[Int]("dense_rk"))).toSeq
    assert(rows("x12d_hybrid_auto") == rows("x12b_hybrid_pruned"),
      "at the default boundary x12d is x12b (pruned lexical + exact dense)")
  }

  test("x12d third route: vector-byte boundary straddles ivf vs pq; forced pq equals x12e") {
    // COVERAGE.md's last prose clause as code (r14): past the pair
    // boundary, the dense leg stays IVF while corpus vector bytes
    // (nCorpus × 16 dims × 8 B) fit graft.x12.maxIvfVectorBytes, and
    // moves to IVF-PQ above it. 100 docs → 90 corpus docs → 11520
    // bytes: straddle the ceiling exactly (inclusive at ==).
    import spark.implicits._
    val words = Seq("zebra", "apple", "pear", "kiwi", "common", "words",
      "other", "things", "table", "river")
    val docs = (0L until 100L).map { id =>
      val t = (0 until 4 + (id % 5).toInt)
        .map(j => words(((id * 7 + j * 3) % 10).toInt)).mkString(" ")
      (id, t, "en", s"src$id")
    }
    val dir = tempDir("x12pq")
    docs.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    def leg = graft.operators.PipelineOps.denseLegAuto(spark, dir)
    try {
      spark.conf.set("graft.x12.maxExactDensePairs", "1") // past exact
      assert(leg == "ivf",
        "below the byte ceiling the dense leg stays IVF (default 32 GiB)")
      spark.conf.set("graft.x12.maxIvfVectorBytes", "11520")
      assert(leg == "ivf", "the byte boundary is inclusive: bytes == ceiling stays IVF")
      spark.conf.set("graft.x12.maxIvfVectorBytes", "11519")
      assert(leg == "pq", "one byte past the ceiling must route to IVF-PQ")
      spark.conf.set("graft.x12.maxIvfVectorBytes", "0")
      intercept[IllegalArgumentException](leg)
      // precedence: the pair rule wins first — a corpus inside the pair
      // boundary routes exact no matter how small the byte ceiling is
      spark.conf.set("graft.x12.maxExactDensePairs", "900")
      spark.conf.set("graft.x12.maxIvfVectorBytes", "1")
      assert(leg == "exact",
        "inside the pair boundary the byte rule must never fire")
    } finally {
      spark.conf.unset("graft.x12.maxExactDensePairs")
      spark.conf.unset("graft.x12.maxIvfVectorBytes")
    }
    // the dispatch wiring end-to-end: x12d under confs that force the
    // pq route must equal the explicit x12e row for row
    def rows(name: String) =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getAs[Long]("qdoc"), r.getAs[Int]("rk"),
          r.getAs[Long]("r_doc"), r.getAs[Long]("rrf"),
          r.getAs[Int]("lex_rk"), r.getAs[Int]("dense_rk"))).toSeq
    val viaPq = rows("x12e_hybrid_ivfpq")
    assert(viaPq.nonEmpty && viaPq.exists(_._6 > 0),
      "x12e must produce dense (ADC-ranked) evidence on this fixture")
    try {
      spark.conf.set("graft.x12.maxExactDensePairs", "1")
      spark.conf.set("graft.x12.maxIvfVectorBytes", "1")
      assert(rows("x12d_hybrid_auto") == viaPq,
        "x12d forced past both ceilings must BE x12e (pruned lexical + IVF-PQ dense)")
    } finally {
      spark.conf.unset("graft.x12.maxExactDensePairs")
      spark.conf.unset("graft.x12.maxIvfVectorBytes")
    }
  }

  test("x12d: graft.x12.queryCount replaces the probe convention in the routing arithmetic") {
    // r15: nQueries = nd/10 is the synthetic corpus's %10 probe
    // convention, not the dispatch's — with an explicit query
    // cardinality the whole documents table is corpus and the conf is
    // the query side. 100 docs: convention gives 10 × 90 = 900 pairs;
    // queryCount=5 gives 5 × 100 = 500 pairs and 100 × 128 = 12,800
    // corpus vector bytes. Both boundaries straddled under the conf.
    import spark.implicits._
    val docs = (0L until 100L).map(id => (id, s"alpha beta g$id", "en", "s"))
    val dir = tempDir("x12qc")
    docs.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    def leg = graft.operators.PipelineOps.denseLegAuto(spark, dir)
    try {
      spark.conf.set("graft.x12.queryCount", "5")
      spark.conf.set("graft.x12.maxExactDensePairs", "500")
      assert(leg == "exact",
        "5 × 100 = 500 pairs at an inclusive 500 ceiling stays exact")
      spark.conf.set("graft.x12.maxExactDensePairs", "499")
      assert(leg == "ivf", "one pair past the ceiling routes to IVF")
      // byte rule under an explicit query count: nCorpus is the WHOLE
      // table (the query set lives elsewhere), so 100 × 16 × 8 bytes
      spark.conf.set("graft.x12.maxIvfVectorBytes", "12800")
      assert(leg == "ivf", "bytes == ceiling stays IVF (inclusive)")
      spark.conf.set("graft.x12.maxIvfVectorBytes", "12799")
      assert(leg == "pq", "one byte past the ceiling routes to IVF-PQ")
      spark.conf.set("graft.x12.queryCount", "zero-ish")
      intercept[IllegalArgumentException](leg)
      spark.conf.set("graft.x12.queryCount", "-3")
      intercept[IllegalArgumentException](leg)
    } finally {
      spark.conf.unset("graft.x12.queryCount")
      spark.conf.unset("graft.x12.maxExactDensePairs")
      spark.conf.unset("graft.x12.maxIvfVectorBytes")
    }
    // conf removed -> the probe convention is back (900 pairs)
    try {
      spark.conf.set("graft.x12.maxExactDensePairs", "899")
      assert(leg == "ivf", "without the conf the 10 × 90 convention routes")
      spark.conf.set("graft.x12.maxExactDensePairs", "900")
      assert(leg == "exact")
    } finally spark.conf.unset("graft.x12.maxExactDensePairs")
  }

  test("d15: the broadcast+combiner strategy equals the shuffle strategy row for row") {
    // r15 equality law for bm25Top5's two physical plans: the
    // broadcast route (per-partition sum + local top-5 combiner, only
    // heads cross the shuffle) and the term-keyed shuffle route (full
    // score matrix + TopK) must agree exactly — same pairs, same
    // integer scores, same (score DESC, doc ASC) head. The fixture
    // plants tied scores (repeated token multisets) so the tie-break
    // is exercised, plus a stop-word so the pruned variant's term set
    // differs between routes' inputs identically.
    import spark.implicits._
    val words = Seq("zebra", "apple", "pear", "kiwi", "common")
    val docs = (0L until 120L).map { id =>
      val t = (0 until 6 + (id % 4).toInt)
        .map(j => words(((id / 3 + j) % 5).toInt)).mkString(" ")
      (id, s"$t common", "en", s"src${id % 7}")
    }
    val dir = tempDir("d15routes")
    docs.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    def rows(name: String) =
      SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSeq
    // default ceiling (500k) routes broadcast at 120 docs
    val viaBroadcast = rows("d15_bm25_topk")
    val viaBroadcastPruned = rows("d15b_bm25_pruned")
    assert(viaBroadcast.nonEmpty)
    try {
      spark.conf.set("graft.bm25.maxBroadcastQueryDocs", "1")
      // SharedFrame keys on name+dir, not on the route conf — clear so
      // the shuffle plan actually executes instead of reading the
      // broadcast run's cached (identical) head
      spark.catalog.clearCache()
      assert(rows("d15_bm25_topk") == viaBroadcast,
        "shuffle route must reproduce the broadcast route's head exactly")
      assert(rows("d15b_bm25_pruned") == viaBroadcastPruned,
        "pruned variant: routes must agree under the df cap too")
      spark.conf.set("graft.bm25.maxBroadcastQueryDocs", "nope")
      intercept[IllegalArgumentException](
        SparkEntry.queries("d15_bm25_topk")(spark, dir))
    } finally {
      spark.conf.unset("graft.bm25.maxBroadcastQueryDocs")
      spark.catalog.clearCache()
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d25 exact substring dedup (Lee et al. 2021 ExactSubstr, bounded
  * anchor-gram variant) against naive in-memory references:
  *
  *  - planted-corpus exactness: a cross-document 20-token block, an
  *    in-document 18-token self-repeat (the case d9's docs_with > 1
  *    grain structurally misses) and a sub-threshold 10-token share
  *    produce exactly the expected removal spans — boundaries included;
  *  - full-output equality with the obvious dictionary reference on
  *    seeded random corpora with planted long copies;
  *  - the COVERAGE law the operator is built on: for every pair of
  *    equal L-token windows in the corpus, the all-but-first occurrence
  *    lies entirely inside one reported removal span.
  */
class ExactSubstrSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val n = 6  // must match d25's anchor gram size
  private val L = 15 // must match d25's minimum span length

  private def toks(text: String): Array[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty)

  private def writeCorpus(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_exsub").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] =
    SparkEntry.queries("d25_exact_substring_dedup")(spark, writeCorpus(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  /** The naive reference: gram-text dictionary, keep-first by
    * (doc_id, pos), per-doc island merge of [p, p+n-1] coverage,
    * spans of >= L tokens.
    */
  private def ref(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] = {
    val occ = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.ArrayBuffer[(Long, Int)]]()
    for ((id, text) <- docs) {
      val ts = toks(text)
      if (ts.length >= n)
        for (i <- 0 to ts.length - n)
          occ.getOrElseUpdate(ts.slice(i, i + n).mkString(" "),
            scala.collection.mutable.ArrayBuffer()) += ((id, i + 1))
    }
    val removable = occ.values.toSeq
      .flatMap(v => v.sortBy(identity).drop(1))
      .groupBy(_._1)
    removable.toSeq.flatMap { case (doc, ps) =>
      val sorted = ps.map(_._2).distinct.sorted
      val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      var start = -1; var last = -1
      for (p <- sorted) {
        if (start < 0) { start = p; last = p }
        else if (p > last + n) { spans += ((start, last + n - 1)); start = p; last = p }
        else last = p
      }
      if (start >= 0) spans += ((start, last + n - 1))
      spans.toSeq
        .filter { case (a, b) => b - a + 1 >= L }
        .map { case (a, b) => (doc, a.toLong, b.toLong, (b - a + 1).toLong) }
    }.sortBy(x => (x._1, x._2))
  }

  /** All pairs of equal L-token windows, first-occurrence-ordered. */
  private def repeatedWindows(
      docs: Seq[(Long, String)]): Seq[((Long, Int), (Long, Int))] = {
    val wins = for {
      (id, text) <- docs
      ts = toks(text)
      if ts.length >= L
      i <- 0 to ts.length - L
    } yield (ts.slice(i, i + L).mkString(" "), (id, i + 1))
    wins.groupBy(_._1).values.toSeq
      .filter(_.size > 1)
      .flatMap { g =>
        val sorted = g.map(_._2).sortBy(identity)
        sorted.drop(1).map(later => (sorted.head, later))
      }
  }

  test("planted corpus: cross-doc block, in-doc repeat, sub-threshold share") {
    def uniq(tag: String, k: Int): Seq[String] = (0 until k).map(i => s"$tag$i")
    val block20 = (0 until 20).map(i => s"blk$i")   // shared doc1 -> doc2
    val block10 = (0 until 10).map(i => s"ten$i")   // shared but < L
    val block18 = (0 until 18).map(i => s"rep$i")   // self-repeat in doc4
    val doc1 = (uniq("a", 8) ++ block20 ++ block10 ++ uniq("b", 7)).mkString(" ")
    val doc2 = (uniq("c", 5) ++ block20 ++ uniq("d", 9)).mkString(" ")
    val doc3 = (uniq("e", 6) ++ block10 ++ uniq("f", 6)).mkString(" ")
    val doc4 = (uniq("g", 4) ++ block18 ++ uniq("h", 5) ++ block18).mkString(" ")
    val doc5 = uniq("z", 30).mkString(" ") // fully unique: no spans
    val docs = Seq(1L -> doc1, 2L -> doc2, 3L -> doc3, 4L -> doc4, 5L -> doc5)
    val got = run(docs)
    // doc2: block20 sits at positions 6..25 — covered exactly (the
    // flanking grams cross into unique fillers and stay canonical)
    // doc4: the SECOND block18 occurrence at positions 28..45
    val expected = Seq(
      (2L, 6L, 25L, 20L),
      (4L, 28L, 45L, 18L))
    assert(got == expected, s"got $got")
    assert(got == ref(docs), "Spark output must equal the naive reference")
  }

  test("equals the naive dictionary reference on random corpora with planted copies") {
    for (seed <- Seq(11, 22, 33)) {
      val rnd = new scala.util.Random(seed)
      // globally unique base tokens so repeats come only from planting
      var next = 0
      def freshTokens(k: Int): Seq[String] =
        (0 until k).map { _ => next += 1; s"u$next" }
      val fresh = (0 until 12).map(i =>
        i.toLong -> freshTokens(5 + rnd.nextInt(30)).mkString(" "))
      // plant: long copies across docs and within one doc
      val copies = (0 until 5).map { j =>
        val src = toks(fresh(rnd.nextInt(fresh.size))._2)
        val cut = math.min(src.length, L + rnd.nextInt(8))
        val body =
          if (j % 2 == 0) src.take(cut) ++ freshTokens(3)
          else src.take(cut) ++ freshTokens(2) ++ src.take(cut) // self-repeat too
        (100L + j) -> body.mkString(" ")
      }
      val docs = fresh ++ copies
      assert(run(docs) == ref(docs), s"seed $seed diverged from reference")
    }
  }

  test("coverage law: every non-first equal L-window lies inside one removal span") {
    val rnd = new scala.util.Random(7)
    var next = 0
    def freshTokens(k: Int): Seq[String] =
      (0 until k).map { _ => next += 1; s"v$next" }
    val base = freshTokens(40)
    val docs = Seq(
      1L -> base.mkString(" "),
      2L -> (freshTokens(4) ++ base.slice(3, 26) ++ freshTokens(5)).mkString(" "),
      3L -> (base.slice(10, 36) ++ freshTokens(2) ++ base.slice(10, 36)).mkString(" "),
      4L -> freshTokens(10 + rnd.nextInt(20)).mkString(" "))
    val spans = run(docs).groupBy(_._1)
    for (((fd, fp), (ld, lp)) <- repeatedWindows(docs)) {
      val inside = spans.getOrElse(ld, Seq.empty).exists { case (_, a, b, _) =>
        a <= lp && lp + L - 1 <= b
      }
      assert(inside,
        s"window at doc $ld pos $lp (first at doc $fd pos $fp) " +
          s"not covered by any removal span: ${spans.getOrElse(ld, Seq.empty)}")
    }
  }
}

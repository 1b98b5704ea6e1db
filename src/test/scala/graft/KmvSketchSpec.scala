package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d23_kmv_source_overlap: the KMV/theta sketch checked by a FULL
  * independent re-derivation (MessageDigest md5, plain-Scala sets and
  * sorts — none of the operator's aggregate/array machinery) on planted
  * multi-source corpora, plus the laws the sketch exists for:
  *
  *  - determinism: bottom-k of a SET — any insertion order, any merge
  *    association — yields the same sketch (BottomK pinned directly);
  *  - disjoint sources estimate EXACTLY zero overlap (no false overlap:
  *    the intersection of bottom-k sketches of disjoint sets is empty);
  *  - the jaccard estimate tracks the exact jaccard within the sketch's
  *    sampling error band on a corpus with controlled overlap.
  */
class KmvSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeDocs(rows: Seq[(Long, String, String, String)], tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** distinct 6-gram hash set of a source's docs — plain Scala */
  private def gramSet(texts: Seq[String]): Set[Long] =
    texts.flatMap { t =>
      val ts = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      if (ts.size < 6) Seq.empty[Long]
      else (0 to ts.size - 6).map(i => h60(ts.slice(i, i + 6).mkString(" ")))
    }.toSet

  private val TH = 1152921504606846976L // 2^60

  /** (k_a, k_b, n_common, n_theta_union, jacc_est_milli, exact_common,
    * exact_jacc_milli) re-derived from first principles
    */
  private def derivePair(a: Set[Long], b: Set[Long], k: Int = 64)
      : (Long, Long, Long, Long, Long, Long, Long) = {
    val ska = a.toSeq.sorted.take(k)
    val skb = b.toSeq.sorted.take(k)
    val ta = if (ska.size < k) TH else ska.last
    val tb = if (skb.size < k) TH else skb.last
    val theta = math.min(ta, tb)
    val af = ska.filter(_ < theta).toSet
    val bf = skb.filter(_ < theta).toSet
    val common = (af & bf).size.toLong
    val union = (af | bf).size.toLong
    val est = if (union == 0) 0L else 1000L * common / union
    val exc = (a & b).size.toLong
    val exj = 1000L * exc / (a.size + b.size - exc)
    (ska.size.toLong, skb.size.toLong, common, union, est, exc, exj)
  }

  private def run(dir: String): Map[(String, String), (Long, Long, Long, Long, Long, Long, Long)] =
    SparkEntry.queries("d23_kmv_source_overlap")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8))).toMap

  test("d23: BottomK is insertion-order and merge-association independent") {
    val agg = graft.functions.BottomK.aggregator(8)
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(200)(rnd.nextLong() & Long.MaxValue) ++ Seq(5L, 5L, 5L)
    val want = xs.distinct.sorted.take(8)
    // three insertion orders
    Seq(xs, xs.reverse, rnd.shuffle(xs)).foreach { order =>
      val r = order.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(r) == want)
    }
    // two merge associations over four chunks
    val chunks = xs.grouped(50).toSeq
      .map(c => c.foldLeft(agg.zero)(agg.reduce))
    val leftFold = chunks.reduceLeft(agg.merge)
    val rightFold = chunks.reduceRight(agg.merge)
    assert(agg.finish(leftFold) == want && agg.finish(rightFold) == want)
  }

  test("d23: output equals the independent re-derivation; disjoint pairs read zero") {
    val rnd = new scala.util.Random(77)
    // srcA and srcB share a 40-token prefix (35 shared grams); srcC is
    // fully disjoint; srcD is tiny (< 64 distinct grams -> theta = 2^60)
    def tokens(tag: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$tag${rnd.nextInt(100000)}_$i")
    val shared = tokens("s", 40)
    val docsA = Seq(1L -> (shared ++ tokens("a", 200)).mkString(" "),
      2L -> tokens("a2", 150).mkString(" "))
    val docsB = Seq(3L -> (shared ++ tokens("b", 180)).mkString(" "))
    val docsC = Seq(4L -> tokens("c", 220).mkString(" "))
    val docsD = Seq(5L -> tokens("d", 20).mkString(" "))
    val all = docsA.map { case (id, t) => (id, t, "en", "srcA") } ++
      docsB.map { case (id, t) => (id, t, "en", "srcB") } ++
      docsC.map { case (id, t) => (id, t, "en", "srcC") } ++
      docsD.map { case (id, t) => (id, t, "en", "srcD") }
    val dir = writeDocs(all, "d23")
    val out = run(dir)
    val sets = Map(
      "srcA" -> gramSet(docsA.map(_._2)), "srcB" -> gramSet(docsB.map(_._2)),
      "srcC" -> gramSet(docsC.map(_._2)), "srcD" -> gramSet(docsD.map(_._2)))
    val names = sets.keys.toSeq.sorted
    val wantPairs = for { a <- names; b <- names if a < b } yield (a, b)
    assert(out.keySet == wantPairs.toSet)
    wantPairs.foreach { case (a, b) =>
      assert(out((a, b)) == derivePair(sets(a), sets(b)),
        s"pair ($a,$b) differs from re-derivation")
    }
    // disjoint pairs: exactly zero estimated and exact overlap
    Seq(("srcA", "srcC"), ("srcB", "srcC"), ("srcC", "srcD")).foreach { p =>
      val (_, _, common, _, est, exc, _) = out(p)
      assert(common == 0L && est == 0L && exc == 0L, s"pair $p must be disjoint")
    }
    // the partially-shared pair is seen: exact overlap present
    assert(out(("srcA", "srcB"))._6 > 0, "srcA/srcB share grams")
  }

  test("d23: jaccard estimate tracks exact jaccard within the sampling band") {
    val rnd = new scala.util.Random(31337)
    // two sources, ~400 distinct grams each, ~25% true jaccard
    val shared = (0 until 200).map(i => s"sh${i}_${rnd.nextInt(1000)}")
    val a = (shared ++ (0 until 200).map(i => s"ax${i}")).mkString(" ")
    val b = (shared ++ (0 until 200).map(i => s"bx${i}")).mkString(" ")
    val dir = writeDocs(Seq((1L, a, "en", "srcA"), (2L, b, "en", "srcB")), "d23band")
    val out = run(dir)
    val (_, _, _, _, est, _, exact) = out(("srcA", "srcB"))
    // k=64 bottom-k jaccard: std err ~ sqrt(j(1-j)/k) ~ 0.055 at j=0.25;
    // 3 sigma ~ 165 milli
    assert(math.abs(est - exact) <= 200,
      s"jaccard est $est milli vs exact $exact milli outside the k=64 band")
  }
}

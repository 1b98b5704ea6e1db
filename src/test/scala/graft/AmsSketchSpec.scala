package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d24_ams_f2_skew: the AMS second-moment sketch checked by a FULL
  * independent re-derivation (MessageDigest md5 bit signs, plain-Scala
  * counter sums) on planted corpora, plus the laws the sketch exists
  * for: counters are LINEAR in the stream (concat = sum — the
  * mergeability that makes them map-side combinable), and the estimate
  * tracks the exact self-join size closely enough to separate a skewed
  * token distribution from a uniform one — the planner read.
  */
class AmsSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def h60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)

  /** 32 sign counters from first principles. */
  private def counters(tokens: Seq[String]): Array[Long] = {
    val c = new Array[Long](32)
    tokens.foreach { t =>
      val hv = h60(t)
      (0 until 32).foreach(s => c(s) += 1L - 2L * ((hv >> s) & 1L))
    }
    c
  }

  private def estF2(tokens: Seq[String]): Long =
    counters(tokens).map(c => c * c).sum / 32

  private def exactF2(tokens: Seq[String]): Long =
    tokens.groupBy(identity).values.map(g => g.size.toLong * g.size).sum

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq

  test("d24: output equals the independent re-derivation per lang") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma alpha", "en"),
      (2L, "beta beta delta", "en"),
      (3L, "un deux deux deux trois", "fr"))
    val dir = writeDocs(docs, "d24")
    val out = SparkEntry.queries("d24_ams_f2_skew")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    Seq("en" -> docs.filter(_._3 == "en"), "fr" -> docs.filter(_._3 == "fr"))
      .foreach { case (lang, ds) =>
        val ts = ds.flatMap(d => toks(d._2))
        val ex = exactF2(ts)
        val est = estF2(ts)
        assert(out(lang) == ((ts.size.toLong, est, ex,
          math.abs(est - ex) * 1000 / ex)), s"$lang differs from re-derivation")
      }
  }

  test("d24: counters are linear — concat equals the counter sum of the parts") {
    val rnd = new scala.util.Random(2468)
    val all = Seq.fill(500)(s"tok${rnd.nextInt(80)}")
    val (a, b) = all.splitAt(211)
    val summed = counters(a).zip(counters(b)).map { case (x, y) => x + y }
    assert(summed.toSeq == counters(all).toSeq,
      "AMS counters must merge by addition")
  }

  test("d24: the estimate separates a skewed stream from a uniform one") {
    val rnd = new scala.util.Random(13)
    // uniform: 600 tokens over an 80-token vocab; skewed: same volume,
    // one token carries half the stream (F2 jumps ~25x)
    val uniform = Seq.fill(600)(s"u${rnd.nextInt(80)}")
    val skewed = Seq.fill(300)("hot") ++ Seq.fill(300)(s"s${rnd.nextInt(80)}")
    val docs = Seq(
      (1L, uniform.mkString(" "), "uni"),
      (2L, skewed.mkString(" "), "skew"))
    val dir = writeDocs(docs, "d24skew")
    val out = SparkEntry.queries("d24_ams_f2_skew")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val (estU, exU) = out("uni")
    val (estS, exS) = out("skew")
    assert(exS > 10 * exU, "planted skew must dominate exact F2")
    assert(estS > 5 * estU,
      s"estimate must expose the skew: uniform $estU vs skewed $estS")
    // deterministic corpus: the estimate lands within a 2/sqrt(32)-ish
    // band of exact on both regimes (checked as a fixed bound here)
    assert(math.abs(estS - exS) * 1000 / exS <= 600,
      s"skewed est $estS vs exact $exS drifted")
  }
}

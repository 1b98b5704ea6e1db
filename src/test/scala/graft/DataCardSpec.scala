package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** x16_shard_data_card: the per-shard dataset card checked by a FULL
  * independent Scala re-derivation — MessageDigest md5 shard hash, bit
  * twiddling HDR buckets, array-register HLL — on a planted corpus, plus
  * the properties each card column exists for: the HLL estimate tracks
  * per-shard exact distinct counts, and the p50/p95 answers sandwich the
  * exact quantiles within the bucket contract.
  */
class DataCardSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def shardOf(docId: Long): Long = h60(docId.toString) % 8

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq

  // --------------------------------------------------------- re-derivation

  private case class Card(nDocs: Long, nTokens: Long, minToks: Long,
    maxToks: Long, p50Lo: Long, p95Lo: Long, vZero: Long, sScaled: Long)

  private def hdrLoOfRank(vs: Seq[Long], qMilli: Long): Long = {
    if (vs.isEmpty) return -1L
    val hist = vs.groupBy { v =>
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val pw = 1L << e
      (e.toLong, ((v - pw) * 16) / pw)
    }.view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val n = vs.size.toLong
    val rank = (qMilli * n + 999) / 1000
    var cum = 0L
    hist.foreach { case ((e, m), cnt) =>
      cum += cnt
      if (cum >= rank) {
        val pw = 1L << e.toInt
        return pw + (m * pw + 15) / 16
      }
    }
    -1L
  }

  private def hllOf(tokens: Seq[String]): (Long, Long) = {
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
    (vZero, s)
  }

  private def deriveCards(docs: Seq[(Long, String)]): Map[Long, Card] =
    docs.groupBy(d => shardOf(d._1)).map { case (shard, ds) =>
      val lens = ds.map(d => toks(d._2).size.toLong)
      val pos = lens.filter(_ >= 1)
      val allToks = ds.flatMap(d => toks(d._2))
      val (vZero, sPresent) = hllOf(allToks)
      shard -> Card(ds.size.toLong, lens.sum, lens.min, lens.max,
        hdrLoOfRank(pos, 500L), hdrLoOfRank(pos, 950L), vZero, sPresent)
    }

  test("x16: card equals the independent re-derivation, per shard") {
    val rnd = new scala.util.Random(99)
    val docs: Seq[(Long, String)] = (1 to 160).map { i =>
      val n = 1 + rnd.nextInt(300)
      (i.toLong, (0 until n).map(k => s"w${rnd.nextInt(500)}").mkString(" "))
    } :+ (161L, "") // an empty doc: counted in n_docs, excluded from quantiles
    val dir = writeDocs(docs.map(d => (d._1, d._2, "en")), "x16")
    val out = SparkEntry.queries("x16_shard_data_card")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getDouble(9))).toMap
    val ref = deriveCards(docs)
    assert(out.keySet == ref.keySet, "shard sets differ")
    ref.foreach { case (shard, c) =>
      val (nd, nt, mn, mx, p50, p95, vz, ss, est) = out(shard)
      assert((nd, nt, mn, mx) == ((c.nDocs, c.nTokens, c.minToks, c.maxToks)),
        s"shard $shard counts differ")
      assert((p50, p95) == ((c.p50Lo, c.p95Lo)), s"shard $shard quantiles differ")
      assert((vz, ss) == ((c.vZero, c.sScaled)), s"shard $shard HLL registers differ")
      assert(math.abs(est - 0.709 * 4096 * 18014398509481984L.toDouble / ss) < 1e-6)
    }
  }

  test("x16: HLL estimate tracks per-shard exact distinct; quantiles sandwich exact") {
    val rnd = new scala.util.Random(1234)
    // ~500-token vocabulary spread over 200 docs, so each shard sees a
    // few hundred distinct tokens — inside HLL(m=64)'s useful range
    val docs: Seq[(Long, String)] = (1 to 200).map { i =>
      val n = 20 + rnd.nextInt(200)
      (i.toLong, (0 until n).map(k => s"tok${rnd.nextInt(500)}").mkString(" "))
    }
    val dir = writeDocs(docs.map(d => (d._1, d._2, "en")), "x16law")
    val out = SparkEntry.queries("x16_shard_data_card")(spark, dir).collect()
    val byShard = docs.groupBy(d => shardOf(d._1))
    out.foreach { r =>
      val shard = r.getLong(0)
      val ds = byShard(shard)
      val exactDistinct = ds.flatMap(d => toks(d._2)).distinct.size
      val est = r.getDouble(9)
      assert(math.abs(est - exactDistinct) <= 0.40 * exactDistinct,
        s"shard $shard: HLL est $est vs exact $exactDistinct outside the m=64 band")
      val lens = ds.map(d => toks(d._2).size.toLong).sorted
      def exactQ(qm: Long): Long = lens(((qm * lens.size + 999) / 1000 - 1).toInt)
      val (p50, p95) = (r.getLong(5), r.getLong(6))
      // bucket lo can undershoot the exact quantile by at most one bucket
      // width (1/16 + rounding); it must never exceed it
      assert(p50 <= exactQ(500L) && p50 * 16 >= exactQ(500L) * 14,
        s"shard $shard p50_lo $p50 vs exact ${exactQ(500L)}")
      assert(p95 <= exactQ(950L) && p95 * 16 >= exactQ(950L) * 14,
        s"shard $shard p95_lo $p95 vs exact ${exactQ(950L)}")
    }
  }
}

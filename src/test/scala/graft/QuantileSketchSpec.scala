package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d22_hdr_quantiles: the HDR-histogram quantile sketch checked by a FULL
  * independent Scala re-derivation (bit-twiddling buckets + a sorted-array
  * exact quantile that shares no structure with the operator's fold), plus
  * the laws the sketch exists for:
  *
  *  - bucket geometry: every value lands inside its bucket's [lo, hi], and
  *    bucket width obeys the relative-error contract;
  *  - the sandwich law est_lo <= exact_q <= est_hi on an adversarial
  *    corpus planted on power-of-two octave boundaries;
  *  - additivity: the histogram of a concatenation is the cell-wise sum of
  *    the parts' histograms (the mergeability claim — why the aggregate is
  *    map-side combinable and order-independent at 100 TB).
  */
class QuantileSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** doc text with exactly v whitespace tokens */
  private def docOf(v: Long): String = Seq.fill(v.toInt)("t").mkString(" ")

  // ------------------------------------------------------------ reference

  /** (octave, sub-bucket) via bit twiddling — shares nothing with the
    * operator's bin()/shiftleft string derivation.
    */
  private def bucket(v: Long): (Long, Long) = {
    val e = (63 - java.lang.Long.numberOfLeadingZeros(v)).toLong
    val pw = 1L << e.toInt
    (e, ((v - pw) * 16) / pw)
  }

  private def loHi(e: Long, m: Long): (Long, Long) = {
    val pw = 1L << e.toInt
    val lo = pw + (m * pw + 15) / 16
    val hi = math.min(pw + ((m + 1) * pw + 15) / 16 - 1, 2 * pw - 1)
    (lo, hi)
  }

  private val qMillis = Seq(100L, 250L, 500L, 750L, 900L, 950L, 990L)

  /** (q_milli, est_lo, est_hi, exact_q) per q, from first principles:
    * histogram scan for the sketch answer, sorted-array index for exact.
    */
  private def derive(vs: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
    val hist = vs.groupBy(bucket).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val n = vs.size.toLong
    val sorted = vs.sorted
    qMillis.map { qm =>
      val rank = (qm * n + 999) / 1000
      var cum = 0L
      var sel: Option[(Long, Long)] = None
      hist.foreach { case (b, cnt) =>
        cum += cnt
        if (sel.isEmpty && cum >= rank) sel = Some(b)
      }
      val (lo, hi) = loHi(sel.get._1, sel.get._2)
      (qm, lo, hi, sorted((rank - 1).toInt))
    }
  }

  private def run(dir: String): Seq[(Long, Long, Long, Long, Long, Int, Long)] =
    SparkEntry.queries("d22_hdr_quantiles")(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getLong(6)))

  // ----------------------------------------------------------------- laws

  test("d22: bucket geometry — every value lies inside its bucket, widths obey the contract") {
    (1L to 5000L).foreach { v =>
      val (e, m) = bucket(v)
      val (lo, hi) = loHi(e, m)
      assert(lo <= v && v <= hi, s"v=$v outside bucket ($e,$m)=[$lo,$hi]")
      assert(m >= 0 && m < 16, s"v=$v sub-bucket $m out of range")
      val pw = 1L << e.toInt
      assert(hi - lo <= pw / 16 + 1, s"bucket ($e,$m) too wide: [$lo,$hi]")
    }
    // buckets tile each octave: consecutive buckets meet with no gap
    (4L to 12L).foreach { e =>
      (0L until 15L).foreach { m =>
        assert(loHi(e, m)._2 + 1 == loHi(e, m + 1)._1,
          s"gap between buckets ($e,$m) and ($e,${m + 1})")
      }
    }
  }

  test("d22: output equals the independent re-derivation on a mixed corpus") {
    val rnd = new scala.util.Random(4242)
    val vs = Seq.fill(120)(1L + rnd.nextInt(900).toLong) ++
      Seq(1L, 2L, 3L, 15L, 16L, 17L, 31L, 32L, 33L, 1023L, 1024L)
    val docs = vs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, docOf(v), "en") } :+
      ((vs.size + 1).toLong, "", "en") // zero-token doc must not count
    val dir = writeDocs(docs, "d22")
    val out = run(dir)
    val ref = derive(vs)
    assert(out.map(_._5).distinct == Seq(vs.size.toLong), "n must exclude the empty doc")
    out.zip(ref).foreach { case ((qm, lo, hi, ex, _, ok, width), (rqm, rlo, rhi, rex)) =>
      assert(qm == rqm && lo == rlo && hi == rhi && ex == rex,
        s"q=$qm: got ($lo,$hi,$ex) want ($rlo,$rhi,$rex)")
      assert(ok == 1, s"q=$qm sandwich law violated: [$lo,$hi] vs exact $ex")
      assert(width == ((hi - lo) * 1000) / lo)
    }
  }

  test("d22: sandwich law holds on an octave-boundary adversarial corpus") {
    // every value sits ON or NEXT TO a power-of-two boundary — the regime
    // where an off-by-one in e/m/lo/hi derivation flips a bucket
    val vs = (0 to 10).flatMap { k =>
      val p = 1L << k
      Seq(p, p + 1, math.max(1L, p - 1))
    }
    val docs = vs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, docOf(v), "en") }
    val dir = writeDocs(docs, "d22adv")
    val out = run(dir)
    val ref = derive(vs.map(_.toLong))
    out.zip(ref).foreach { case ((qm, lo, hi, ex, _, ok, _), (_, rlo, rhi, rex)) =>
      assert(ok == 1, s"q=$qm sandwich violated on boundary corpus")
      assert((lo, hi, ex) == ((rlo, rhi, rex)), s"q=$qm mismatch vs re-derivation")
    }
    // relative width contract where the guarantee applies (lo >= 16)
    out.filter(_._2 >= 16).foreach { case (qm, _, _, _, _, _, width) =>
      assert(width <= 125, s"q=$qm width_milli $width exceeds the 1/16(+rounding) contract")
    }
  }

  test("d22: histograms are additive — cell-wise sum of parts equals the whole") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(400)(1L + rnd.nextInt(5000).toLong)
    val (a, b) = vs.splitAt(137)
    def histOf(xs: Seq[Long]): Map[(Long, Long), Long] =
      xs.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val merged = (histOf(a).keySet ++ histOf(b).keySet).map { k =>
      k -> (histOf(a).getOrElse(k, 0L) + histOf(b).getOrElse(k, 0L))
    }.toMap
    assert(merged == histOf(vs), "bucket counters must merge by cell-wise addition")
  }
}

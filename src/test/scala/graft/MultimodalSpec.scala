package graft

import graft.functions.{FrameContainer, PngCodec}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The m-family's real PNG codec: encode→decode roundtrip exactness,
  * batched-reader vs per-row decode equivalence, degenerate thumbnail
  * buckets (unreachable from the id-derived corpus, whose w,h ≥ 8), and
  * the m3/m4 queries against an independent per-pixel reference fold.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def refPixels(w: Int, h: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h)(i => PngCodec.pixel(i % w, i / w, seed))

  test("png synthesize → decode roundtrips the closed-form pixels exactly") {
    val cases = Seq((1, 1, 0L), (3, 5, 7L), (16, 16, 255L), (5, 2, -9L), (12, 14, 1234567L))
    for ((w, h, seed) <- cases) {
      val (dw, dh, px) = PngCodec.decodeOne(PngCodec.synthesize(w, h, seed))
      assert((dw, dh) == (w, h), s"dims for ($w,$h,$seed)")
      assert(px.sameElements(refPixels(w, h, seed)), s"pixels for ($w,$h,$seed)")
    }
  }

  test("batched decode (reused reader) matches the per-row path") {
    val batch = (0L until 40L).map(id => id -> PngCodec.synthesize(id))
    val batched = PngCodec.decodeBatch(batch)((id, w, h, px) => (id, w, h, px.toSeq))
    val perRow = batch.map { case (id, bytes) =>
      val (w, h, px) = PngCodec.decodeOne(bytes); (id, w, h, px.toSeq)
    }
    assert(batched == perRow.toVector)
  }

  test("batched encode (reused writer) is byte-identical to synthesize") {
    val ids = (0L until 40L) ++ Seq(Long.MaxValue, -1L)
    val batched = PngCodec.encodeBatch(ids.iterator).toVector
    assert(batched.map(_._1) == ids.toVector)
    for (((id, bytes), i) <- batched.zipWithIndex) {
      assert(bytes.sameElements(PngCodec.synthesize(ids(i))), s"bytes for id $id")
      // and the payloads are genuine PNG: magic + decodable closed form
      assert(bytes.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
      val (w, h, px) = PngCodec.decodeOne(bytes)
      assert((w, h) == PngCodec.dims(id) && px.sameElements(refPixels(w, h, id)))
    }
  }

  test("boxThumb: degenerate buckets emit -1, others floor-average their exact box") {
    // w = 3 < 4: bucket column bx=1 has x-span [3/4, 6/4) = [0, 1) at
    // integer division — spans collapse for SOME bx; check against an
    // independent fold over the same box definition
    val (w, h, seed) = (3, 9, 5L)
    val px = refPixels(w, h, seed)
    val got = PngCodec.boxThumb(w, h, px)
    val want = (0 until 16).map { b =>
      val (bx, by) = (b % 4, b / 4)
      val xs = (bx * w / 4) until ((bx + 1) * w / 4)
      val ys = (by * h / 4) until ((by + 1) * h / 4)
      val vals = for (y <- ys; x <- xs) yield px(y * w + x).toLong
      if (vals.isEmpty) -1L else vals.sum / vals.length
    }
    assert(got.toSeq == want)
    assert(got.contains(-1L), "a 3-wide image must produce at least one empty bucket")
    // 4×4 source → identity resize (every bucket is exactly one pixel)
    val idPx = refPixels(4, 4, 11L)
    assert(PngCodec.boxThumb(4, 4, idPx).toSeq == idPx.map(_.toLong).toSeq)
  }

  test("wav synthesize → decode roundtrips the closed-form samples exactly") {
    import graft.functions.WavCodec
    val cases = Seq((1, 0L), (2, 7L), (256, 255L), (319, -9L), (300, 1234567L))
    for ((n, seed) <- cases) {
      val (rate, samples) = WavCodec.decode(WavCodec.synthesize(n, seed))
      assert(rate == 8000f, s"rate for ($n,$seed)")
      assert(samples.length == n, s"length for ($n,$seed)")
      assert(samples.sameElements(Array.tabulate(n)(WavCodec.sample(_, seed))),
        s"samples for ($n,$seed)")
    }
    // genuine RIFF container, not raw PCM
    assert(WavCodec.synthesize(0L).take(4)
      .sameElements("RIFF".getBytes("US-ASCII")))
  }

  test("registry-free WAV parse matches the javax.sound reference decoder") {
    import graft.functions.WavCodec
    for (seed <- Seq(0L, 1L, 63L, 12345L, -77L); n <- Seq(1, 2, 255, 256, 319)) {
      val bytes = WavCodec.synthesize(n, seed)
      val (rate, samples) = WavCodec.decode(bytes)
      val (refRate, refSamples) = WavCodec.decodeRegistry(bytes)
      assert(rate == refRate, s"rate parity for ($n,$seed)")
      assert(samples.sameElements(refSamples), s"sample parity for ($n,$seed)")
    }
  }

  test("registry-free WAV parse rejects malformed payloads cleanly") {
    import graft.functions.WavCodec
    val good = WavCodec.synthesize(64, 5L)
    // not RIFF at all
    intercept[IllegalArgumentException](WavCodec.decode("hello".getBytes))
    // truncated mid-data: declared chunk size exceeds the buffer
    intercept[IllegalArgumentException](WavCodec.decode(good.take(good.length - 10)))
    // stereo/16-bit formats are refused, not misread
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](32)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 16L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    intercept[IllegalArgumentException](WavCodec.decode(bos.toByteArray))
  }

  test("wav features match an independent fold over the samples") {
    import graft.functions.WavCodec
    val samples = Array(128, 130, 125, 128, 120, 200, 0, 255, 128, 1)
    val (ampSum, energy, crossings) = WavCodec.features(samples)
    assert(ampSum == samples.map(_.toLong).sum)
    assert(energy == samples.map(s => (s - 128L) * (s - 128L)).sum)
    // strict sign changes of (s - 128): 130→125, 125→... 128 is neither
    // positive nor negative, so a through-midpoint pair with an exact-128
    // sample between them does NOT count
    val signs = samples.map(_ - 128)
    val want = signs.sliding(2).count(p => p(0).toLong * p(1) < 0)
    assert(crossings == want)
  }

  test("m3/m4 queries match an independent reference over assorted doc ids") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 4L, 6L, 34L, 35L, 999L, 123456789L)
    val dir = java.nio.file.Files.createTempDirectory("graft_png").toString
    ids.map(id => (id, s"doc $id")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")

    val m3 = SparkEntry.queries("m3_decode_features")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val m3Want = ids.sorted.map { id =>
      val (w, h) = PngCodec.dims(id)
      val px = refPixels(w, h, id)
      (id, w.toLong, h.toLong, px.map(_.toLong).sum, px(0).toLong)
    }
    assert(m3.toSeq == m3Want)

    val m4 = SparkEntry.queries("m4_resize_thumbnail")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val m4Want = ids.sorted.map { id =>
      val (w, h) = PngCodec.dims(id)
      (id, w.toLong, h.toLong,
        PngCodec.boxThumb(w, h, refPixels(w, h, id)).mkString(","))
    }
    assert(m4.toSeq == m4Want)

    import graft.functions.WavCodec
    val m5 = SparkEntry.queries("m5_audio_features")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val m5Want = ids.sorted.map { id =>
      val n = WavCodec.nSamples(id)
      val samples = Array.tabulate(n)(WavCodec.sample(_, id))
      val (ampSum, energy, crossings) = WavCodec.features(samples)
      (id, n.toLong, 8000L, ampSum, energy, crossings)
    }
    assert(m5.toSeq == m5Want)

    val m2b = SparkEntry.queries("m2b_container_frames")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val m2bWant = ids.sorted.flatMap { id =>
      (0 until FrameContainer.nFrames(id) by 2).map { f =>
        val (w, h) = FrameContainer.frameDims(id, f)
        val px = refPixels(w, h, FrameContainer.frameSeed(id, f))
        (id, f.toLong, w.toLong, h.toLong, px.map(_.toLong).sum)
      }
    }
    assert(m2b.toSeq == m2bWant)
  }

  test("frame container: demux + full decode roundtrips every closed-form frame") {
    val ids = Seq(0L, 1L, 4L, 7L, 123456789L)
    val containers = FrameContainer.synthesizePartition(ids.iterator).toVector
    // container is genuine: magic header, frame count, length-prefixed PNGs
    for ((id, bytes) <- containers)
      assert(bytes.take(4).sameElements(FrameContainer.Magic), s"magic for $id")
    // stride 1 = decode everything: matches the closed form frame by frame
    val all = FrameContainer.decodeSampledPartition(containers.iterator, 1).toVector
    val want = ids.flatMap { id =>
      (0 until FrameContainer.nFrames(id)).map { f =>
        val (w, h) = FrameContainer.frameDims(id, f)
        (id, f.toLong, w.toLong, h.toLong,
          refPixels(w, h, FrameContainer.frameSeed(id, f)).map(_.toLong).sum)
      }
    }
    assert(all == want)
  }

  test("frame container: stride sampling keeps exactly every k-th frame") {
    val ids = Seq(3L, 5L) // nFrames = 4 + id mod 5 = 7 and 4
    val containers = FrameContainer.synthesizePartition(ids.iterator).toVector
    val s3 = FrameContainer.decodeSampledPartition(containers.iterator, 3).toVector
    assert(s3.map(t => (t._1, t._2)) ==
      Seq((3L, 0L), (3L, 3L), (3L, 6L), (5L, 0L), (5L, 3L)))
    // stride beyond the frame count still emits frame 0 (never an empty doc)
    val s99 = FrameContainer.decodeSampledPartition(containers.iterator, 99).toVector
    assert(s99.map(t => (t._1, t._2)) == Seq((3L, 0L), (5L, 0L)))
  }
}

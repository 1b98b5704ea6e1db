package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import javax.imageio.ImageIO

/** A REAL multi-frame media container behind the frame-sampling verb —
  * the video analogue of [[PngCodec]] (m3/m4) and [[WavCodec]] (m5): a
  * length-prefixed stream of genuine PNG frames, frame-sampled and
  * decoded by a genuine decoder. This is the shape of every video
  * pipeline's first stage (demux → sample every k-th frame → decode the
  * sampled frames ONLY) with the JDK-available codec standing in for the
  * container format the JDK lacks; the demux/sample/decode plumbing is
  * format-agnostic.
  *
  * Layout: `"GRFT" | int32 nFrames | nFrames × (int32 len | PNG bytes)`
  * (big-endian, DataOutputStream's wire format).
  *
  * Everything is closed-form in (doc id, frame index) — `nFrames = 4 +
  * id mod 5`, frame seed `131·id + f`, dims `(8 + (id+f) mod 3) × (8 +
  * (id+2f) mod 4)`, pixels [[PngCodec.pixel]] — so a SQL oracle
  * recomputes every sampled frame's features without parsing the
  * container: the DuckDB gate checks demux, the sampling arithmetic, and
  * the per-frame decode end to end (a length-prefix bug, an off-stride
  * sample, or a seed mix-up all surface as hash mismatches).
  *
  * Batching: one `ImageWriter`/`ImageReader` per [[PngCodec.CodecChunk]]
  * docs, reused across the chunk's frames — the [[PngCodec.decodeBatch]]
  * lesson applied at the container level, where the per-frame fan-out
  * multiplies the per-use codec setup cost a convenience path would pay.
  * Chunked (not per-partition) so live payload bytes stay bounded.
  */
object FrameContainer {

  val Magic: Array[Byte] = Array('G', 'R', 'F', 'T').map(_.toByte)

  def nFrames(id: Long): Int = (4 + Math.floorMod(id, 5L)).toInt

  def frameSeed(id: Long, f: Int): Long = 131L * id + f

  def frameDims(id: Long, f: Int): (Int, Int) =
    ((8 + Math.floorMod(id + f, 3L)).toInt,
      (8 + Math.floorMod(id + 2L * f, 4L)).toInt)

  /** Encode one partition's containers with one reused PNG `ImageWriter`
    * per [[PngCodec.CodecChunk]]-doc chunk (each chunk is a strict `Seq`,
    * materialized before its writer is disposed): codec setup amortized
    * 64×, live payload bytes bounded by the chunk — never the whole
    * partition, which with real media is an executor OOM.
    */
  def synthesizePartition(ids: Iterator[Long]): Iterator[(Long, Array[Byte])] =
    ids.grouped(PngCodec.CodecChunk).flatMap { chunk =>
      val writers = ImageIO.getImageWritersByFormatName("png")
      require(writers.hasNext, "no PNG ImageWriter installed")
      val writer = writers.next()
      try {
        chunk.map { id =>
          val n = nFrames(id)
          val out = new ByteArrayOutputStream()
          val dos = new DataOutputStream(out)
          dos.write(Magic)
          dos.writeInt(n)
          var f = 0
          while (f < n) {
            val (w, h) = frameDims(id, f)
            val frame = new ByteArrayOutputStream()
            val ios = ImageIO.createImageOutputStream(frame)
            try {
              writer.setOutput(ios)
              writer.write(PngCodec.render(w, h, frameSeed(id, f)))
            } finally ios.close()
            val bytes = frame.toByteArray
            dos.writeInt(bytes.length)
            dos.write(bytes)
            f += 1
          }
          dos.flush()
          (id, out.toByteArray)
        }
      } finally writer.dispose()
    }

  /** Demux one partition's containers, decode every `stride`-th frame
    * (frame 0 always included) with a single reused `ImageReader`, and
    * emit `(id, frameIdx, width, height, pixelSum)`. Skipped frames are
    * never decoded — only their length prefix is read to seek past them,
    * which is the entire point of frame sampling at 100 TB (decode cost
    * scales with the SAMPLE, IO with the container).
    */
  def decodeSampledPartition(rows: Iterator[(Long, Array[Byte])], stride: Int)
      : Iterator[(Long, Long, Long, Long, Long)] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    // one reused ImageReader per CodecChunk-doc chunk (strict Seq per
    // chunk → decoded features materialize before the reader is
    // disposed); the outer grouped iterator stays lazy, so at most one
    // chunk's containers are live at a time — bounded memory, amortized
    // codec setup (the whole-partition toVector this replaces held every
    // container in the partition simultaneously)
    rows.grouped(PngCodec.CodecChunk).flatMap { chunk =>
      val readers = ImageIO.getImageReadersByFormatName("png")
      require(readers.hasNext, "no PNG ImageReader installed")
      val reader = readers.next()
      try {
        chunk.flatMap { case (id, bytes) =>
          val in = new DataInputStream(new ByteArrayInputStream(bytes))
          val magic = new Array[Byte](4)
          in.readFully(magic)
          require(java.util.Arrays.equals(magic, Magic),
            s"bad container magic for doc $id")
          val n = in.readInt()
          (0 until n).flatMap { f =>
            val len = in.readInt()
            if (f % stride != 0) { in.skipNBytes(len.toLong); None }
            else {
              val png = new Array[Byte](len)
              in.readFully(png)
              val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(png))
              try {
                reader.setInput(iis, true, true)
                val img = reader.read(0)
                val px = PngCodec.grayPixels(img)
                var sum = 0L
                var i = 0
                while (i < px.length) { sum += px(i); i += 1 }
                Some((id, f.toLong, img.getWidth.toLong, img.getHeight.toLong, sum))
              } finally iis.close()
            }
          }
        }
      } finally reader.dispose()
    }
  }
}

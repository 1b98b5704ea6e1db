package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** A REAL audio codec behind the m-family multimodal operators — the
  * audio sibling of [[PngCodec]]: deterministic 8-bit unsigned mono PCM
  * WAV payloads synthesized from the doc id, then decoded with
  * `javax.sound.sampled`'s RIFF/WAVE reader. Genuine containerized audio
  * flows through a genuine decoder; the closed-form sample function —
  * `sample(i) = (13·i + id) mod 256`, `n = 256 + id mod 64`, 8 kHz —
  * keeps every decoded feature SQL-recomputable, so the DuckDB gate
  * checks the whole encode→decode→feature pipeline end to end (a header
  * mix-up, an unsigned/signed confusion, or a sample-order bug all
  * surface as hash mismatches).
  *
  * 8-bit unsigned PCM is the one WAV sample format whose byte stream IS
  * the sample stream (no endianness, no sign bias beyond the fixed 128
  * midpoint), which keeps the roundtrip exact and the oracle arithmetic
  * integer-only.
  *
  * On real corpora, swap [[synthesize]] for the stored binary column;
  * everything downstream of the `(id, bytes)` pair is payload-agnostic.
  */
object WavCodec {

  /** Closed-form 8-bit unsigned sample (midpoint 128). */
  def sample(i: Int, seed: Long): Int = Math.floorMod(13L * i + seed, 256L).toInt

  /** Deterministic per-doc length: 256..319 samples at 8 kHz. */
  def nSamples(id: Long): Int = (256 + Math.floorMod(id, 64L)).toInt

  val SampleRate = 8000f

  /** Encode the closed-form signal for `id` as a real RIFF/WAVE stream. */
  def synthesize(id: Long): Array[Byte] = synthesize(nSamples(id), id)

  /** Encode `n` closed-form samples with an arbitrary seed (specs use
    * degenerate lengths the id-derived corpus never produces).
    */
  def synthesize(n: Int, seed: Long): Array[Byte] = {
    val data = new Array[Byte](n)
    var i = 0
    while (i < n) { data(i) = sample(i, seed).toByte; i += 1 }
    val fmt = new AudioFormat(SampleRate, 8, 1, false, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  /** Decode a WAV payload: (sampleRate, unsigned samples 0..255).
    *
    * This is a direct RIFF chunk walk (12-byte RIFF/WAVE header, then
    * word-aligned `fmt `/`data` chunks per the WAVE container layout) —
    * deliberately NOT `AudioSystem.getAudioInputStream`, whose
    * synchronized provider-registry lookup serializes concurrent
    * decoders and makes a 32-way partition fan-out SLOWER than one
    * partition (measured at r7: warm m5 0.5 s on one split vs 1.9-2.3 s
    * on 32). A plain byte parse has no shared state, so the decode
    * stage parallelizes like the PNG/container families. The registry
    * path survives as [[decodeRegistry]] purely as a spec cross-check.
    */
  def decode(bytes: Array[Byte]): (Float, Array[Int]) = {
    require(bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a RIFF/WAVE stream")
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    var pos = 12
    var sampleRate = -1f
    var fmtSeen = false
    var samples: Array[Int] = null
    while (pos + 8 <= bytes.length && (samples == null || !fmtSeen)) {
      val size = u32(pos + 4)
      require(size <= Int.MaxValue && pos + 8 + size <= bytes.length,
        s"truncated RIFF chunk at offset $pos (declared $size bytes)")
      val body = pos + 8
      val n = size.toInt
      if (bytes(pos) == 'f' && bytes(pos + 1) == 'm' &&
          bytes(pos + 2) == 't' && bytes(pos + 3) == ' ') {
        require(n >= 16, s"fmt chunk too short ($n bytes)")
        val audioFormat = u16(body)
        val channels = u16(body + 2)
        sampleRate = u32(body + 4).toFloat
        val bits = u16(body + 14)
        // format code 1 = integer PCM; 8-bit PCM is unsigned by the WAVE
        // convention, which is exactly the synthesize() layout
        require(audioFormat == 1 && channels == 1 && bits == 8,
          s"expected 8-bit unsigned mono PCM, got format=$audioFormat " +
            s"channels=$channels bits=$bits")
        fmtSeen = true
      } else if (bytes(pos) == 'd' && bytes(pos + 1) == 'a' &&
          bytes(pos + 2) == 't' && bytes(pos + 3) == 'a') {
        require(fmtSeen, "data chunk precedes fmt chunk")
        samples = new Array[Int](n)
        var i = 0
        while (i < n) { samples(i) = bytes(body + i) & 0xff; i += 1 }
      }
      pos = body + n + (n & 1) // RIFF chunks are word-aligned
    }
    require(fmtSeen && samples != null, "missing fmt or data chunk")
    (sampleRate, samples)
  }

  /** The javax.sound decode path the engine used through r8 — kept ONLY
    * as an independent reference implementation for the spec parity
    * test; query paths use the registry-free [[decode]] above.
    */
  def decodeRegistry(bytes: Array[Byte]): (Float, Array[Int]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1 &&
        fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED,
        s"expected 8-bit unsigned mono PCM, got $fmt")
      val raw = ais.readAllBytes()
      (fmt.getSampleRate, raw.map(b => b & 0xff))
    } finally ais.close()
  }

  /** The m5 feature vector over decoded samples — integer-only so the
    * closed-form oracle reproduces it exactly: amplitude sum, energy
    * (squared deviation from the 128 midpoint), and midpoint crossings
    * (strict sign change between consecutive samples).
    */
  def features(samples: Array[Int]): (Long, Long, Long) = {
    var ampSum = 0L
    var energy = 0L
    var crossings = 0L
    var i = 0
    while (i < samples.length) {
      val c = samples(i) - 128
      ampSum += samples(i)
      energy += c.toLong * c
      if (i > 0 && (samples(i - 1) - 128).toLong * c < 0) crossings += 1
      i += 1
    }
    (ampSum, energy, crossings)
  }
}

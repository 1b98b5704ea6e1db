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

  /** Decode a WAV payload: (sampleRate, unsigned samples 0..255). Unlike
    * ImageIO there is no reusable reader object to batch — the static
    * `AudioSystem.getAudioInputStream` provider lookup IS the API — so
    * the batching lever for audio is partition-level fan-out, not reader
    * reuse (the m3/m4 lesson still applies to the mapPartitions shape).
    */
  def decode(bytes: Array[Byte]): (Float, Array[Int]) = {
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

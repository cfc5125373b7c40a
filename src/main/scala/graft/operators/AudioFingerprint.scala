package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K5: AUDIO near-dup fingerprinting — the audio sibling of
  * [[PerceptualHash]]: a 64-bit fingerprint from the SIGN OF ADJACENT
  * ENERGY DELTAS over a fixed-frame energy envelope (the core idea of
  * Haitsma–Kalker audio fingerprinting / Chromaprint, reduced to the
  * time-domain envelope: robust to gain changes — scaling all samples
  * preserves every energy ordering — and to small local edits, which
  * perturb only the frames they touch).
  *
  * Pipeline (same shape as the image path, so the banded-LSH machinery is
  * SHARED):
  *  - REAL path: WAV bytes → JDK `javax.sound.sampled` PCM decode →
  *    [[energyEnvelope]] (65 equal frames, mean |amplitude| each) →
  *    [[deltaSignHash]] (bit k = env(k+1) > env(k)). Proven on genuinely
  *    encoded WAV in AudioFingerprintSpec; the container has no audio
  *    corpus, so the DECLARED query uses the deterministic surrogate:
  *  - SURROGATE path: the same striped 72-cell reduction the image
  *    surrogate uses ([[PerceptualHash.surrogateGrid]]) read as a 1-D
  *    envelope — locality-preserving (a payload edit of Δ code points
  *    perturbs ≤ Δ cells → Hamming ≤ 2Δ), so the declared query
  *    demonstrates genuine Hamming-near retrieval and DuckDB re-derives
  *    every step.
  *  - Candidates + verify: [[PerceptualHash.nearDupPairs]] — 4×16-bit
  *    banded Hamming LSH with exact XOR-popcount verification; any
  *    (h_hi, h_lo)-hashed corpus plugs in.
  *
  * At 100 TB the fingerprint is 8 bytes per clip computed map-side from
  * the decoded frames; near-dup candidate generation never leaves the
  * banded equi-join shape.
  */
object AudioFingerprint {

  /** Mean-|amplitude| envelope over `nFrames` equal slices of the PCM
    * samples. Short clips (fewer samples than frames) pad with zero
    * frames — deterministic, and the delta hash then keys on the onset
    * position.
    */
  def energyEnvelope(pcm: Array[Double], nFrames: Int = 65): Array[Double] = {
    val out = new Array[Double](nFrames)
    if (pcm.isEmpty) return out
    val frameLen = math.max(1, pcm.length / nFrames)
    var f = 0
    while (f < nFrames) {
      val start = f * frameLen
      // the LAST frame absorbs the division remainder — with a plain
      // frameLen cut, up to frameLen-1 trailing samples (half the clip
      // when frameLen is 1) would never influence the fingerprint
      val end =
        if (f == nFrames - 1) pcm.length
        else math.min(pcm.length, start + frameLen)
      if (start < pcm.length) {
        var s = 0.0
        var i = start
        while (i < end) { s += math.abs(pcm(i)); i += 1 }
        out(f) = s / (end - start)
      }
      f += 1
    }
    out
  }

  /** 64 delta-sign bits over a ≥65-entry envelope, packed like the image
    * dHash: (h_hi = bits 32..63, h_lo = bits 0..31), each an unsigned
    * 32-bit value in a Long.
    */
  def deltaSignHash(env: Array[Double]): (Long, Long) = {
    require(env.length >= 65, s"envelope needs ≥65 frames, got ${env.length}")
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < 64) {
      if (env(k + 1) > env(k)) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    (hi, lo)
  }

  /** Decode WAV bytes to mono PCM doubles via the JDK (16-bit PCM;
    * multi-channel frames average). Fails loudly on non-audio payloads —
    * the [[MultimodalPipeline.JavaSoundCodec]] contract.
    */
  def decodeWavPcm(bytes: Array[Byte]): Array[Double] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    // the loop below reinterprets raw frames as signed 16-bit words —
    // any other sample layout must fail loudly, not produce misaligned
    // garbage (8-bit would even read past the buffer on the last frame)
    require(fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16,
      s"only 16-bit signed PCM supported, got ${fmt.getEncoding} " +
        s"${fmt.getSampleSizeInBits}-bit")
    val frameSize = fmt.getFrameSize
    val data = in.readAllBytes()
    val channels = fmt.getChannels
    val n = data.length / frameSize
    val out = new Array[Double](n)
    val bigEndian = fmt.isBigEndian
    var i = 0
    while (i < n) {
      var sum = 0.0
      var c = 0
      while (c < channels) {
        val off = i * frameSize + c * 2
        val s =
          if (bigEndian) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
          else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
        sum += s / 32768.0
        c += 1
      }
      out(i) = sum / channels
      i += 1
    }
    out
  }

  /** One half of the delta-sign hash over a 72-cell envelope COLUMN
    * (surrogate path): bit k = env(k+1) > env(k), 0-based `getItem`.
    * `k0 = 0` → h_lo, `k0 = 32` → h_hi. Builtin expression tree, no UDF.
    */
  def deltaHalf(env: Column, k0: Int): Column =
    (k0 until k0 + 32).map { k =>
      when(env.getItem(k + 1) > env.getItem(k), lit(1L << (k - k0)))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Closed-form 16-bit sample for the synthetic-WAV corpus
    * (`k5_audio_real_fingerprint`): signed, full range.
    */
  def sampleAt(mediaId: Long, i: Int): Int =
    (((mediaId * 7919L + i * 104729L) % 65536L) - 32768L).toInt

  /** Deterministic 65-sample mono 16-bit PCM WAV whose samples are the
    * closed form [[sampleAt]] — the audio analogue of
    * [[MultimodalPipeline.syntheticPngBytes]]: with exactly 65 samples the
    * 65-frame [[energyEnvelope]] is one sample per frame (mean |s/32768|
    * of one sample), |s|/2¹⁵ is an exact power-of-two division, and WAV
    * PCM is lossless — so the REAL decode→envelope→delta-sign chain must
    * reproduce `|s(i+1)| > |s(i)|` bit-for-bit, which the DuckDB oracle
    * re-derives in integer arithmetic.
    */
  def syntheticWavBytes(mediaId: Long): Array[Byte] = {
    import javax.sound.sampled._
    val data = new Array[Byte](65 * 2)
    var i = 0
    while (i < 65) {
      val s = sampleAt(mediaId, i)
      data(2 * i) = (s & 0xff).toByte        // little-endian
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, 65),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}

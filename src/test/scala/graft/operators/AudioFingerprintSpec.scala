package graft.operators

import graft.SparkSpec

/** K5 audio fingerprint: the real WAV path (synthesize PCM → encode WAV →
  * JDK decode → envelope → delta-sign hash) plus the robustness properties
  * the fingerprint exists for, and the declared query's shape.
  */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  /** Deterministic "melody": sum of two sines whose amplitudes step per
    * segment, giving a structured energy envelope.
    */
  private def tone(seconds: Double, seed: Int, rate: Int = 8000): Array[Double] = {
    val n = (seconds * rate).toInt
    // per-segment amplitude from a seeded RNG: different seeds give
    // INDEPENDENT envelope shapes (a constant shift would preserve every
    // adjacent ordering and fool the delta-sign hash by design).
    // 65 segments = the envelope's frame count, so each envelope frame
    // reads one segment's amplitude — misaligned segments would smear
    // adjacent frames together and correlate the delta bits through the
    // shared carrier phase instead of the amplitudes under test.
    val amps = Array.tabulate(65)(seg =>
      0.2 + 0.6 * new scala.util.Random(seed * 1009 + seg).nextDouble())
    Array.tabulate(n) { i =>
      val amp = amps(math.min(64, i * 65 / n))
      amp * math.sin(2 * math.Pi * 440 * i / rate) * 0.5 +
        amp * math.sin(2 * math.Pi * 311 * i / rate) * 0.3
    }
  }

  private def encodeWav(pcm: Array[Double], rate: Float = 8000f): Array[Byte] = {
    val bytes = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) {
      val s = math.max(-32768, math.min(32767, (pcm(i) * 32767).toInt)).toShort
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, pcm.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV path: decode round-trips PCM, gain change preserves the fingerprint") {
    val pcm = tone(2.0, seed = 5)
    val decoded = AudioFingerprint.decodeWavPcm(encodeWav(pcm))
    assert(math.abs(decoded.length - pcm.length) <= 1)
    // 16-bit quantization only
    assert(pcm.zip(decoded).map { case (a, b) => math.abs(a - b) }.max < 1e-3)

    val h = AudioFingerprint.deltaSignHash(
      AudioFingerprint.energyEnvelope(decoded))
    // gain: half the volume — every energy ORDERING is preserved, so the
    // fingerprint must be IDENTICAL (the robustness the delta-sign buys)
    val quiet = AudioFingerprint.deltaSignHash(
      AudioFingerprint.energyEnvelope(
        AudioFingerprint.decodeWavPcm(encodeWav(pcm.map(_ * 0.5)))))
    assert(hamming(h, quiet) <= 2,
      s"gain change must not move the fingerprint: ${hamming(h, quiet)}")
  }

  test("synthetic 65-sample WAV round trip is the identity on the sample formula") {
    // the k5_audio_real_fingerprint contract: encode -> javax.sound
    // decode -> 65-frame envelope -> delta-sign must reproduce
    // |s(i+1)| > |s(i)| on the closed form exactly (one sample per
    // frame, lossless PCM, power-of-two normalization)
    Seq(1L, 4L, 12345L, 999997L).foreach { id =>
      val pcm = AudioFingerprint.decodeWavPcm(
        AudioFingerprint.syntheticWavBytes(id))
      assert(pcm.length == 65, s"id=$id: ${pcm.length} samples")
      (0 until 65).foreach { i =>
        assert(pcm(i) == AudioFingerprint.sampleAt(id, i) / 32768.0,
          s"id=$id i=$i: decoded ${pcm(i)} != formula")
      }
      val (hi, lo) = AudioFingerprint.deltaSignHash(
        AudioFingerprint.energyEnvelope(pcm))
      (0 until 64).foreach { k =>
        val expected = math.abs(AudioFingerprint.sampleAt(id, k + 1)) >
          math.abs(AudioFingerprint.sampleAt(id, k))
        val got = if (k < 32) ((lo >> k) & 1L) == 1L
                  else ((hi >> (k - 32)) & 1L) == 1L
        assert(got == expected, s"id=$id bit $k")
      }
    }
  }

  test("near-identical clips hash near; a different melody hashes far") {
    val base = tone(2.0, seed = 5)
    // local edit: a click in one spot perturbs only the frames it touches
    val clicked = base.clone()
    (4000 until 4080).foreach(i => clicked(i) = 0.9)
    val other = tone(2.0, seed = 6)

    def hashOf(p: Array[Double]) = AudioFingerprint.deltaSignHash(
      AudioFingerprint.energyEnvelope(AudioFingerprint.decodeWavPcm(encodeWav(p))))
    val (hb, hc, ho) = (hashOf(base), hashOf(clicked), hashOf(other))
    assert(hamming(hb, hc) <= 10, s"local edit drifted ${hamming(hb, hc)} bits")
    assert(hamming(hb, ho) > 10, s"different melody too close: ${hamming(hb, ho)}")
  }

  test("non-audio payload fails loudly, never a garbage fingerprint") {
    intercept[Exception] {
      AudioFingerprint.decodeWavPcm("not audio at all".getBytes)
    }
  }

  test("declared k5_audio_neardup: planted near-dup text clips pair, surrogate localizes edits") {
    val got = graft.SparkEntry.queries("k5_audio_neardup")(spark, sfDir)
    val rows = got.collect()
    // sanity of shape; pair content is under the DuckDB gate
    assert(got.columns.toSeq == Seq("id_a", "id_b", "hamming"))
    rows.foreach(r => assert(r.getInt(2) <= 10))
  }

  test("video near-dup: one rewritten quarter leaves the other 3 frames matching") {
    import org.apache.spark.sql.functions._
    val base = ("abcdefgh " * 40).trim // 359 chars ≥ 288
    val q = base.length / 4
    // clip 2: third quarter completely rewritten, rest identical
    val edited = base.substring(0, 2 * q) + ("ZQX" * (q / 3 + 1)).substring(0, q) +
      base.substring(3 * q)
    val docs = Seq((2L, base), (5L, edited), (8L, "totally different payload " * 14))
      .toDF("doc_id", "text")
    val perFrame = (0 until 4).map { f =>
      val frameText = expr(
        s"substring(text, 1 + $f * (length(text) div 4), length(text) div 4)")
      val framed = docs
        .withColumn("_g", PerceptualHash.surrogateGrid(frameText))
        .select(col("doc_id"),
          PerceptualHash.dHashHalf(col("_g"), 32).as("h_hi"),
          PerceptualHash.dHashHalf(col("_g"), 0).as("h_lo"))
      PerceptualHash.nearDupPairs(framed, "doc_id", maxHamming = 10)
        .withColumn("_f", lit(f))
    }
    val pairs = perFrame.reduce(_ unionAll _)
      .groupBy("id_a", "id_b")
      .agg(countDistinct(col("_f")).as("n_frames_close"),
        min(col("hamming")).as("min_hamming"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((2L, 5L)).exists(n => n >= 3),
      s"3 untouched frames must match: $pairs")
    assert(!pairs.contains((2L, 8L)) && !pairs.contains((5L, 8L)),
      s"unrelated clip must not pair: $pairs")
  }
}

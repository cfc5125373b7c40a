package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import graft.SparkSpec

/** Real-pixel VIDEO path end-to-end: planted MJPEG-AVI fixtures (RIFF
  * container written by [[MjpegAvi.writeContainer]], baseline-JPEG
  * frames via ImageIO) decode to real frames, real luma grids, real
  * per-frame dHashes — and near-identical frames land within the same
  * Hamming radius the declared video near-dup query uses, while
  * dissimilar frames stay far. The corpus query keeps its documented
  * surrogate (the synthetic testdata has no real media bytes); this
  * proves the production path the registry dispatches at deployment.
  */
class MjpegAviSpec extends SparkSpec {

  private def frame(seed: Int, w: Int = 64, h: Int = 64,
      noise: Int = 0): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    // structured gradient + seeded texture: dHash needs real luma
    // variation, and near-dup frames must differ only by faint noise
    for (y <- 0 until h; x <- 0 until w) {
      val base = ((x * 255 / w) + (y * 255 / h)) / 2
      val tex = ((x / 8 + y / 8) % 2) * 60
      val n = if (noise > 0) rnd.nextInt(2 * noise + 1) - noise else 0
      val v = math.max(0, math.min(255, base + tex + n))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def jpeg(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", out), "no JPEG writer")
    out.toByteArray
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("container round-trip: written AVI parses back to the same frame bytes") {
    val frames = Seq(jpeg(frame(1)), jpeg(frame(2)), jpeg(frame(3)))
    val avi = MjpegAvi.writeContainer(frames, 64, 64)
    // a real RIFF AVI signature, not a reader-shaped blob
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val back = MjpegAvi.readFrames(avi)
    assert(back.length == 3)
    back.zip(frames).foreach { case (b, f) =>
      assert(java.util.Arrays.equals(b, f), "frame bytes must round-trip")
    }
  }

  test("real frames, real pixels: near-dup frames within the query's Hamming radius, distinct frames far") {
    // frame 0 and its faint-noise twin; frame 2 is structurally different
    val f0 = frame(7)
    val f0twin = frame(99, noise = 3)
    val inverted = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = 255 - ((f0.getRGB(x, y) >> 8) & 0xff)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val avi = MjpegAvi.writeContainer(
      Seq(jpeg(f0), jpeg(f0twin), jpeg(inverted)), 64, 64)
    val hs = MjpegAvi.frameHashes(avi)
    assert(hs.map(_._1) == Seq(0, 1, 2))
    val h = hs.map(t => (t._2, t._3))
    // the declared video query's verify radius is 10
    assert(hamming(h(0), h(1)) <= 10,
      s"near-identical frames too far: ${hamming(h(0), h(1))}")
    assert(hamming(h(0), h(2)) > 10,
      s"inverted frame too close: ${hamming(h(0), h(2))}")
  }

  test("frame chunks outside LIST('movi') are not harvested") {
    // plant a header-area chunk whose id ends in 'dc' before hdrl: a
    // conforming reader must skip it (frames live only inside movi)
    val frame = "real-frame-payload".getBytes("US-ASCII")
    val avi = MjpegAvi.writeContainer(Seq(frame), 8, 8)
    def le32(v: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    val junkPayload = "JUNKDATA".getBytes("US-ASCII")
    val junk = "99dc".getBytes("US-ASCII") ++ le32(junkPayload.length) ++ junkPayload
    // splice right after the 12-byte RIFF/AVI header, then fix the RIFF size
    val spliced = avi.take(12) ++ junk ++ avi.drop(12)
    System.arraycopy(le32(spliced.length - 8), 0, spliced, 4, 4)
    val frames = MjpegAvi.readFrames(spliced)
    assert(frames.length == 1)
    assert(frames.head.toSeq == frame.toSeq)
  }

  test("synthetic DIB AVI round trip is the identity on the luma formula") {
    // the k5_video_real_phash contract: container walk -> BMP wrap ->
    // ImageIO decode -> grayGrid -> dHash64 must reproduce videoLumaAt
    // exactly (lossless DIB, one pixel per dHash cell, bottom-up rows
    // and BGR order both round-tripping)
    Seq(2L, 5L, 31415L).foreach { id =>
      val hashes = MjpegAvi.dibFrameHashes(MjpegAvi.syntheticDibAvi(id))
      assert(hashes.map(_._1) == Seq(0, 1, 2, 3))
      hashes.foreach { case (f, hi, lo) =>
        val grid = Array.tabulate(72)(idx => MjpegAvi.videoLumaAt(id, f, idx))
        assert((hi, lo) == PerceptualHash.dHash64(grid), s"id=$id frame=$f")
      }
    }
  }

  test("corrupt containers and frames fail loudly") {
    intercept[IllegalArgumentException] {
      MjpegAvi.readFrames("not a riff file at all".getBytes)
    }
    val bogus = MjpegAvi.writeContainer(Seq("junk".getBytes), 64, 64)
    intercept[IllegalArgumentException] { MjpegAvi.frameHashes(bogus) }
  }
}

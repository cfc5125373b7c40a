package graft.operators

import graft.SparkSpec
import graft.analytics.SimilarityQueries
import java.awt.image.BufferedImage

/** K5 perceptual-hash near-dup: the real pixel path (encode → ImageIO
  * decode → luma grid → dHash) on genuinely encoded images, the LSH
  * pigeonhole guarantee, and the declared query's shape.
  */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("dHash64 packs adjacent-luma bits row-major into two uint32 halves") {
    // strictly increasing left→right in every row → all 64 bits set
    val rising = Array.tabulate(72)(i => (i % 9) * 10)
    assert(PerceptualHash.dHash64(rising) === ((0xffffffffL, 0xffffffffL)))
    // flat grid → no bit set
    val flat = Array.fill(72)(128)
    assert(PerceptualHash.dHash64(flat) === ((0L, 0L)))
    // exactly bit 0: row 0, col 0 rises once
    val one = Array.fill(72)(50)
    one(1) = 60
    assert(PerceptualHash.dHash64(one) === ((0L, 1L)))
    // exactly bit 63: row 7, col 7→8 rises (grid index 7*9+7=70 → 71)
    val top = Array.fill(72)(50)
    top(71) = 60
    assert(PerceptualHash.dHash64(top) === ((0x80000000L, 0L)))
  }

  /** A deterministic gradient image with per-pixel seeded texture. */
  private def testImage(w: Int, h: Int, seed: Int, f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real pixel path: near-identical encoded images hash near, different far") {
    // decode path goes through REAL bytes: PNG-encode, ImageIO-decode
    def hashOf(img: BufferedImage): (Long, Long) = {
      val decoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(encodePng(img)))
      PerceptualHash.dHash64(PerceptualHash.grayGrid(decoded))
    }
    val base = testImage(90, 64, 1, (x, y) => x * 2 + (x * 31 + y * 17) % 13)
    val tweaked = testImage(90, 64, 1, (x, y) =>
      x * 2 + (x * 31 + y * 17) % 13 + (if (x == 40 && y == 30) 40 else 0))
    val inverted = testImage(90, 64, 1, (x, y) => 200 - x * 2 + (x * 13 + y * 7) % 11)
    val hBase = hashOf(base)
    val hTweak = hashOf(tweaked)
    val hInv = hashOf(inverted)
    assert(hamming(hBase, hTweak) <= 4,
      s"one-pixel tweak moved the hash too far: ${hamming(hBase, hTweak)}")
    assert(hamming(hBase, hInv) >= 32,
      s"inverted gradient should be far: ${hamming(hBase, hInv)}")
  }

  test("synthetic 9x8 PNG round trip is the identity on the luma formula") {
    // the k5_image_real_dhash contract: encode -> ImageIO decode ->
    // grayGrid -> dHash64 must reproduce the closed form exactly, because
    // at the 9x8 grid size the box-average is one pixel per cell and
    // Rec.601 of an r=g=b pixel is the value itself
    Seq(0L, 3L, 4242L, 999999L).foreach { id =>
      val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        MultimodalPipeline.syntheticPngBytes(id)))
      assert(decoded.getWidth == 9 && decoded.getHeight == 8)
      val grid = PerceptualHash.grayGrid(decoded)
      (0 until 72).foreach { idx =>
        assert(grid(idx) == MultimodalPipeline.lumaAt(id, idx),
          s"id=$id idx=$idx: decoded ${grid(idx)} != formula ${MultimodalPipeline.lumaAt(id, idx)}")
      }
    }
  }

  test("banded LSH finds every pair within Hamming 3 (pigeonhole) and dedups bands") {
    // base hash; ≤3 bit flips spread across three DIFFERENT bands still
    // leave band 3 intact → pair guaranteed. Also a far hash → no pair.
    val base = (0x12345678L, 0x9abcdef0L)
    val flipped = (base._1 ^ (1L << 0) ^ (1L << 16), base._2 ^ (1L << 0))
    val far = (~base._1 & 0xffffffffL, ~base._2 & 0xffffffffL)
    val df = Seq(
      (1L, base._1, base._2),
      (2L, flipped._1, flipped._2),
      (3L, base._1, base._2), // exact dup of 1
      (4L, far._1, far._2)
    ).toDF("doc_id", "h_hi", "h_lo")
    val pairs = PerceptualHash.nearDupPairs(df, "doc_id", maxHamming = 10)
      .orderBy("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // (1,3) exact at 0 — collides in all 4 bands but must appear ONCE;
    // (1,2) and (2,3) at 3 via the intact band; 4 pairs with nobody.
    assert(pairs.toSeq === Seq((1L, 2L, 3), (1L, 3L, 0), (2L, 3L, 3)))
  }

  test("real-raster registry path: planted PNG near-dups found end-to-end in Spark") {
    import graft.operators.MultimodalPipeline.{MediaRecord, extractPixelFeatures}
    import spark.implicits._
    // REAL encoded images: a textured gradient, a one-pixel tweak of it
    // (the dHash near-dup), an exact byte-identical copy, and an
    // unrelated inverse gradient
    val base = testImage(90, 64, 1, (x, y) => x * 2 + (x * 31 + y * 17) % 13)
    val tweak = testImage(90, 64, 1, (x, y) =>
      x * 2 + (x * 31 + y * 17) % 13 + (if (x == 40 && y == 30) 40 else 0))
    val other = testImage(90, 64, 1, (x, y) => 200 - x * 2 + (x * 13 + y * 7) % 11)
    val records = Seq(
      MediaRecord(1L, "image", encodePng(base), "{}"),
      MediaRecord(2L, "image", encodePng(tweak), "{}"),
      MediaRecord(3L, "image", encodePng(base), "{}"),
      MediaRecord(4L, "image", encodePng(other), "{}"))
    // the full pipeline: payload bytes → registry raster decode
    // (ImageIO.read → luma grid → dHash) → banded LSH → verified pairs
    val feats = extractPixelFeatures(spark.createDataset(records))
    val rows = feats.collect()
    assert(rows.forall(f => f.width == 90 && f.height == 64),
      "raster decode must recover true dimensions from the encoded bytes")
    val pairs = PerceptualHash.nearDupPairs(
        feats.toDF().select($"media_id", $"h_hi", $"h_lo"), "media_id",
        maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      .sortBy(p => (p._1, p._2))
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap.get((1L, 3L)).contains(0), s"exact copy not at Hamming 0: $pairs")
    assert(asMap.contains((1L, 2L)) && asMap((1L, 2L)) <= 6,
      s"one-pixel tweak not a near-dup: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated image paired: $pairs")
  }

  test("raster registry fails loudly on undecodable bytes and unknown modalities") {
    import graft.operators.MultimodalPipeline.{MediaRecord, rasterRegistry}
    val junk = intercept[IllegalArgumentException] {
      rasterRegistry.decode(MediaRecord(9L, "image", Array[Byte](1, 2, 3), "{}"))
    }
    assert(junk.getMessage.contains("not a decodable image"))
    val unknown = intercept[IllegalArgumentException] {
      rasterRegistry.decode(MediaRecord(9L, "audio", Array[Byte](1), "{}"))
    }
    assert(unknown.getMessage.contains("no pixel codec"))
  }

  test("k5_phash_neardup matches an independent JVM-side re-derivation") {
    val out = SimilarityQueries.queries("k5_phash_neardup")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty, "corpus has near-dup variants among image-modality docs")
    assert(out.forall { case (a, b, _) => a < b })
    assert(out.distinct.length === out.length)
    // independent re-derivation: striped grid + dHash64 + banding in plain
    // Scala over the collected corpus (sf0.001 is small)
    val docs = graft.Tables.documents(spark, sfDir)
      .where("doc_id % 3 = 0").select("doc_id", "text")
      .as[(Long, String)].collect()
    val hashes = docs.map { case (id, t) =>
      val cells = new Array[Long](72) // Long accumulation, like the expression
      var p = 0
      t.codePoints().forEach { cp => cells(p % 72) += cp; p += 1 }
      id -> PerceptualHash.dHash64(cells.map(c => (c % 256).toInt))
    }.toMap
    def bandKeys(h: (Long, Long)): Seq[Long] =
      Seq(h._2 & 0xffffL, (h._2 >> 16) & 0xffffL, h._1 & 0xffffL, (h._1 >> 16) & 0xffffL)
    val ids = hashes.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1 until ids.size).iterator
      a = ids(i); b = ids(j)
      if bandKeys(hashes(a)).zip(bandKeys(hashes(b))).exists { case (x, y) => x == y }
      hm = hamming(hashes(a), hashes(b)) if hm <= 10
    } yield (a, b, hm)).toSeq
    assert(out.toSeq === expected)
  }
}

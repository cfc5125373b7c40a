package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** REAL video frame path with zero dependencies: Motion-JPEG in a RIFF
  * AVI container — the one real video format whose container (RIFF, the
  * 1992 Microsoft/IBM spec) and frame payloads (baseline JPEG, decodable
  * by JDK ImageIO) are BOTH parseable without a native codec. This is
  * the video sibling of the image leg's `ImageIoRasterCodec` and the
  * audio leg's JDK WAV-PCM path: the corpus's synthetic media keeps its
  * documented surrogate, while this codec proves the real per-frame
  * pixel pipeline end-to-end on planted fixtures (MjpegAviSpec).
  *
  * Reader: walks RIFF chunks — `RIFF('AVI ' … LIST('movi' [00dc|00db]*)` —
  * and returns each video chunk's JPEG bytes (ids `##dc`/`##db` are the
  * AVI compressed/uncompressed video chunk codes; chunk data pads to
  * even offsets per RIFF). Corrupt containers fail loudly, like every
  * codec in the registry.
  *
  * Writer: emits a structurally valid minimal AVI (avih + one MJPG
  * stream's strh/strf, then the movi list) so fixtures are real files
  * other tools can open, not reader-shaped blobs.
  */
object MjpegAvi {

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** JPEG payloads of the video chunks, in file order. */
  def readFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes.length >= 12, "truncated RIFF header")
    def str(off: Int) = new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int) =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(str(0) == "RIFF" && str(8) == "AVI ",
      s"not a RIFF AVI container: ${str(0)}/${str(8)}")
    val frames = Seq.newBuilder[Array[Byte]]
    // frame chunks are only harvested INSIDE a LIST('movi') — a header or
    // junk chunk whose id happens to end in dc/db must not leak in as a
    // frame payload (rec lists nest inside movi per the AVI spec)
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = str(p)
        val sz = u32(p + 4)
        require(sz >= 0 && p + 8 + sz <= end,
          s"chunk '$id' overruns the container (size $sz at offset $p)")
        if (id == "LIST") {
          // list type occupies the first 4 payload bytes
          val listType = str(p + 8)
          walk(p + 12, p + 8 + sz, inMovi || listType == "movi")
        } else if (inMovi && id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db"))) {
          frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + sz)
        }
        p += 8 + sz + (sz & 1) // RIFF pads chunks to even sizes
      }
    }
    walk(12, math.min(8 + u32(4), bytes.length), inMovi = false)
    frames.result()
  }

  /** Write JPEG frame payloads as a minimal, structurally valid MJPG AVI. */
  def writeContainer(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 30): Array[Byte] =
    writeContainerAs(frames, width, height, fps, codec = "MJPG")

  /** The container writer behind both codecs this object speaks: MJPG
    * (compressed `00dc` chunks, JPEG payloads) and `DIB ` (uncompressed
    * `00db` chunks, raw bottom-up BGR rows — BI_RGB, the LOSSLESS leg of
    * the AVI spec that `k5_video_real_phash`'s closed-form oracle needs;
    * JPEG is lossy, so no formula survives an MJPG round trip).
    */
  def writeContainerAs(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int, codec: String): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    require(codec == "MJPG" || codec == "DIB ", s"unsupported codec '$codec'")
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(fourcc(id)); out.write(le32(data.length)); out.write(data)
      if ((data.length & 1) == 1) out.write(0) // even padding
      out.toByteArray
    }
    def list(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(fourcc("LIST")); out.write(le32(payload.length + 4))
      out.write(fourcc(tpe)); out.write(payload)
      out.toByteArray
    }
    val usPerFrame = 1000000 / fps
    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPerFrame).putInt(0).putInt(0)
        .putInt(0 /*flags: no idx1 chunk is written, so HASINDEX stays off*/)
      b.putInt(frames.length).putInt(0).putInt(1 /*streams*/)
      // dwSuggestedBufferSize: the largest chunk a reader must buffer —
      // chunk header + the stride-aware frame size for DIB; MJPG frame
      // sizes vary, so advertise the largest actual frame
      b.putInt(8 + (if (codec == "MJPG") frames.map(_.length).maxOption.getOrElse(0)
                    else ((width * 3 + 3) & ~3) * height))
      b.putInt(width).putInt(height)
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("vids")).put(fourcc(codec))
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(1).putInt(fps) // rate = fps/1
      b.putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      b.putShort(0.toShort).putShort(0.toShort)
      b.putShort(width.toShort).putShort(height.toShort)
      b.array()
    }
    val strf = { // BITMAPINFOHEADER
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height)
      b.putShort(1.toShort).putShort(24.toShort)
      // biCompression: the codec fourcc for MJPG, BI_RGB (0) for DIB
      if (codec == "MJPG") b.put(fourcc("MJPG")) else b.putInt(0)
      // biSizeImage: BI_RGB frames carry 4-byte-aligned row strides
      // (dibFrame emits them), so the declared size must include the
      // padding — a strict external BMP/AVI parser rejects a header
      // whose size disagrees with the actual 00db chunk length. MJPG
      // sizes vary per frame; its conventional value here is the
      // unpadded estimate (decoders must use the chunk length anyway).
      if (codec == "MJPG") b.putInt(width * height * 3)
      else b.putInt(((width * 3 + 3) & ~3) * height)
      b.putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val chunkId = if (codec == "MJPG") "00dc" else "00db"
    val movi = list("movi",
      frames.toArray.flatMap(f => chunk(chunkId, f)))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Raw uncompressed 24-bit DIB frame (bottom-up BGR rows, 4-byte row
    * stride — the BI_RGB layout) from a row-major luma grid.
    */
  def dibFrame(luma: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(luma.length == width * height, "luma grid size mismatch")
    val stride = ((width * 3) + 3) & ~3
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val srcRow = height - 1 - y // DIB rows store bottom-up
      var x = 0
      while (x < width) {
        val v = luma(srcRow * width + x).toByte
        val off = y * stride + x * 3
        out(off) = v; out(off + 1) = v; out(off + 2) = v // B G R
        x += 1
      }
      y += 1
    }
    out
  }

  /** (width, height) from the container's first strf BITMAPINFOHEADER. */
  private def readDims(bytes: Array[Byte]): (Int, Int) = {
    def str(off: Int) = new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int) =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    var p = 12
    val end = math.min(8 + u32(4), bytes.length)
    var found: Option[(Int, Int)] = None
    def walk(start: Int, stop: Int): Unit = {
      var q = start
      while (q + 8 <= stop && found.isEmpty) {
        val id = str(q); val sz = u32(q + 4)
        if (id == "LIST") walk(q + 12, q + 8 + sz)
        else if (id == "strf" && sz >= 12)
          found = Some((u32(q + 12), u32(q + 16)))
        q += 8 + sz + (sz & 1)
      }
    }
    walk(p, end)
    found.getOrElse(throw new IllegalArgumentException("no strf header"))
  }

  /** Per-frame perceptual hashes for an UNCOMPRESSED (`DIB `) AVI: the
    * same real container walk as [[frameHashes]], each raw frame wrapped
    * into a valid BMP (14-byte file header + the BITMAPINFOHEADER the
    * strf declares) and decoded by the REAL ImageIO BMP reader — a fully
    * lossless pixel path end to end, which is what lets
    * `k5_video_real_phash` sit under a closed-form DuckDB oracle.
    */
  def dibFrameHashes(payload: Array[Byte]): Seq[(Int, Long, Long)] = {
    MultimodalPipeline.imageIoNoDiskCache
    val (w, h) = readDims(payload)
    readFrames(payload).zipWithIndex.map { case (dib, i) =>
      val bmp = new ByteArrayOutputStream()
      bmp.write('B'); bmp.write('M')
      bmp.write(le32(14 + 40 + dib.length))
      bmp.write(le32(0)); bmp.write(le32(14 + 40))
      val info = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      info.putInt(40).putInt(w).putInt(h)
        .putShort(1.toShort).putShort(24.toShort)
        .putInt(0 /*BI_RGB*/).putInt(dib.length)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bmp.write(info.array()); bmp.write(dib)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bmp.toByteArray))
      if (img == null)
        throw new IllegalArgumentException(
          s"frame $i is not a decodable DIB (${dib.length} bytes at ${w}x$h)")
      val (hi, lo) = PerceptualHash.dHash64(PerceptualHash.grayGrid(img))
      (i, hi, lo)
    }
  }

  /** Closed-form per-frame luma for the synthetic DIB-AVI corpus
    * (`k5_video_real_phash`), idx = r·9+c.
    */
  def videoLumaAt(mediaId: Long, frame: Int, idx: Int): Int =
    ((mediaId * 7919L + frame * 131071L + idx * 104729L) % 256L).toInt

  /** Deterministic 4-frame 9×8 uncompressed AVI whose frame lumas are
    * [[videoLumaAt]] — the video analogue of the synthetic PNG/WAV
    * corpora: DIB is lossless and 9×8 makes the box-average the
    * identity, so container walk → BMP decode → grid → dHash must
    * reproduce the formula bit-for-bit.
    */
  def syntheticDibAvi(mediaId: Long, nFrames: Int = 4): Array[Byte] = {
    val frames = (0 until nFrames).map { f =>
      dibFrame(Array.tabulate(72)(idx => videoLumaAt(mediaId, f, idx)), 9, 8)
    }
    writeContainerAs(frames, 9, 8, fps = 30, codec = "DIB ")
  }

  /** Per-frame perceptual hashes straight off the real pixels: decode
    * each MJPEG frame with ImageIO, box-average to the 9×8 luma grid,
    * dHash. A frame no reader decodes fails loudly.
    */
  def frameHashes(payload: Array[Byte]): Seq[(Int, Long, Long)] = {
    MultimodalPipeline.imageIoNoDiskCache
    readFrames(payload).zipWithIndex.map { case (jpeg, i) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      if (img == null)
        throw new IllegalArgumentException(
          s"frame $i is not a decodable JPEG (${jpeg.length} bytes)")
      val (hi, lo) = PerceptualHash.dHash64(PerceptualHash.grayGrid(img))
      (i, hi, lo)
    }
  }
}

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
      fps: Int = 30): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
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
      b.putInt(frames.length).putInt(0).putInt(1 /*streams*/).putInt(0)
      b.putInt(width).putInt(height)
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("vids")).put(fourcc("MJPG"))
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
      b.put(fourcc("MJPG")).putInt(width * height * 3)
      b.putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Per-frame perceptual hashes straight off the real pixels: decode
    * each MJPEG frame with ImageIO, box-average to the 9×8 luma grid,
    * dHash. A frame no reader decodes fails loudly.
    */
  def frameHashes(payload: Array[Byte]): Seq[(Int, Long, Long)] =
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

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** K5: multimodal column plumbing — image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * Header decode is REAL for all three modalities: [[ImageIoCodec]] reads
  * PNG/JPEG/GIF/BMP headers through the JDK's `javax.imageio`,
  * [[JavaSoundCodec]] reads WAV/AIFF/AU via `javax.sound.sampled`, and
  * [[Mp4HeaderCodec]] walks ISO BMFF (MP4/MOV) container boxes directly —
  * zero external dependencies. The image PIXEL stage is real too:
  * [[ImageIoRasterCodec]] decodes full rasters (`ImageIO.read`) into the
  * perceptual-hash features ([[PixelFeatures]]), proven end-to-end on
  * planted PNG near-dups in PerceptualHashSpec. VIDEO frame decode
  * (H.264 etc.) still needs a deployment codec; [[decodeStub]] remains
  * available as the deterministic stand-in. Everything around the codecs —
  * the schema, the typed record, the `mapPartitions` batch shape (one
  * iterator pass per partition, no per-row task overhead, the Scala
  * analogue of `mapInPandas` batches), the registry dispatch, and the
  * partitioning — is real, tested plumbing further codecs drop into.
  * The declared (oracled) k5 queries keep the stub registry so the DuckDB
  * oracle can reproduce them; OperatorSpec exercises [[ImageIoCodec]] on
  * genuinely encoded images.
  */
object MultimodalPipeline {

  /** One media record: payload is the opaque encoded bytes. */
  final case class MediaRecord(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      meta_json: String)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      byte_len: Int,
      width: Int, // stub: derived, deterministic
      height: Int,
      frames: Int,
      checksum: String)

  /** Pluggable decoder — the production interface point. A deployment with
    * real codecs registers one [[MediaCodec]] per modality (JPEG decode,
    * PCM resample, H.264 frame grab); the pipeline dispatches per record
    * inside the partition iterator. Implementations must be Serializable
    * (the instance ships inside the `mapPartitions` closure to every
    * executor) and stateless or executor-thread-safe.
    */
  trait MediaCodec extends Serializable {
    /** Modalities this codec claims, e.g. Set("image"). */
    def modalities: Set[String]
    def decode(r: MediaRecord): MediaFeatures
  }

  /** Modality→codec dispatch table. Unknown modalities fail loudly at the
    * first record rather than silently emitting stub features — on a real
    * corpus a payload routed to the wrong decoder is corrupt output, not a
    * recoverable default.
    */
  final case class CodecRegistry(codecs: Seq[MediaCodec]) {
    private[this] val byModality: Map[String, MediaCodec] = {
      val bindings = codecs.flatMap(c => c.modalities.iterator.map(_ -> c))
      val dups = bindings.groupBy(_._1).filter(_._2.size > 1).keys
      require(dups.isEmpty,
        s"modalities claimed by more than one codec: ${dups.toSeq.sorted.mkString(", ")} — " +
          "a silent last-wins override would route payloads to the wrong decoder")
      bindings.toMap
    }
    def decode(r: MediaRecord): MediaFeatures =
      byModality.getOrElse(r.modality, throw new IllegalArgumentException(
        s"no codec registered for modality '${r.modality}' (media_id=${r.media_id}); " +
          s"registered: ${byModality.keys.toSeq.sorted.mkString(", ")}")).decode(r)
  }

  /** Stub codec claiming the given modalities — composes with real codecs
    * (e.g. [[ImageIoCodec]] for image + stub for the rest).
    */
  def stubCodec(mods: Set[String]): MediaCodec = new MediaCodec {
    val modalities: Set[String] = mods
    def decode(r: MediaRecord): MediaFeatures = decodeStub(r)
  }

  /** Default registry: the deterministic stub for all three modalities. */
  val stubRegistry: CodecRegistry = CodecRegistry(
    Seq(stubCodec(Set("image", "audio", "video"))))

  /** REAL image decode via the JDK's `javax.imageio` — PNG/JPEG/GIF/BMP
    * need no external codec library. Dimensions come from the image
    * HEADER (`ImageReader.getWidth/getHeight`, not a full raster decode),
    * so cost per record is parsing a few hundred bytes — the right unit
    * economics for a 100 TB media scan where most pipelines only need
    * metadata gates (resolution filters, aspect buckets) before a GPU
    * stage does the pixel work. A payload no installed reader recognizes
    * fails loudly (corrupt media must not flow on as fake features).
    * Audio/video route to their own codecs ([[JavaSoundCodec]],
    * [[Mp4HeaderCodec]]).
    */
  final class ImageIoCodec extends MediaCodec {
    val modalities: Set[String] = Set("image")
    def decode(r: MediaRecord): MediaFeatures = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext)
          throw new IllegalArgumentException(
            s"media_id=${r.media_id}: payload is not a decodable image " +
              s"(${r.payload.length} bytes, no ImageIO reader claims it)")
        val reader = readers.next()
        try {
          reader.setInput(in)
          val h = java.security.MessageDigest.getInstance("SHA-256").digest(r.payload)
          // allowSearch=false keeps this pass header-only: counting the
          // frames of an animated GIF would walk the ENTIRE payload,
          // breaking the few-hundred-bytes unit economics. -1 ("unknown
          // without a search") maps to 1 — still images are the corpus
          // norm, and a pixel-stage decoder owns the exact frame count.
          MediaFeatures(
            media_id = r.media_id,
            modality = r.modality,
            byte_len = r.payload.length,
            width = reader.getWidth(0),
            height = reader.getHeight(0),
            frames = reader.getNumImages(/* allowSearch = */ false).max(1),
            checksum = checksum(h))
        } finally reader.dispose()
      } finally in.close()
    }
  }

  /** REAL audio header decode via the JDK's `javax.sound.sampled` —
    * WAV/AIFF/AU need no external codec. Field mapping onto the shared
    * [[MediaFeatures]] record (documented, not overloaded silently):
    * `width` = sample rate in Hz, `height` = channel count, `frames` =
    * total sample frames — the three gates an audio-corpus pipeline
    * filters on (resample targets, mono/stereo splits, duration buckets;
    * duration seconds = frames / width). Header-only parse, same unit
    * economics as [[ImageIoCodec]]. Unrecognized payloads fail loudly.
    * Compressed formats (MP3/OGG) have no JDK codec and stay outside —
    * register a real codec for them at deployment.
    */
  final class JavaSoundCodec extends MediaCodec {
    val modalities: Set[String] = Set("audio")
    def decode(r: MediaRecord): MediaFeatures = {
      val fmt =
        try javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(r.payload))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"media_id=${r.media_id}: payload is not a decodable audio file " +
                s"(${r.payload.length} bytes): ${e.getMessage}")
        }
      val h = java.security.MessageDigest.getInstance("SHA-256").digest(r.payload)
      MediaFeatures(
        media_id = r.media_id,
        modality = r.modality,
        byte_len = r.payload.length,
        width = fmt.getFormat.getSampleRate.toInt,
        height = fmt.getFormat.getChannels,
        frames = fmt.getFrameLength.max(0),
        checksum = checksum(h))
    }
  }

  /** REAL video header decode for ISO BMFF containers (MP4/MOV/M4V) — a
    * zero-dependency box walker, the same header-only unit economics as
    * [[ImageIoCodec]]: no JDK video codec exists, but the CONTAINER
    * metadata a corpus gate needs (duration, presentation dimensions)
    * lives in plain big-endian boxes. Field mapping (documented like
    * [[JavaSoundCodec]]'s): `width`/`height` = the first non-degenerate
    * track's 16.16 presentation size from `tkhd`; `frames` = movie
    * duration in MILLISECONDS from `mvhd` (timescale-normalized — the
    * container does not carry a frame count without walking sample
    * tables, which would break header-only economics; duration is the
    * gate real pipelines filter on). Malformed/non-BMFF payloads fail
    * loudly. Frame PIXEL data still needs a real decoder at deployment.
    */
  final class Mp4HeaderCodec extends MediaCodec {
    val modalities: Set[String] = Set("video")

    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def boxType(b: Array[Byte], i: Int): String =
      new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk sibling boxes in [from, until), returning (payloadStart,
      * payloadEnd) of the first box of `want`. Box sizes are validated so
      * a corrupt length can't loop or read out of bounds.
      */
    private def findBox(b: Array[Byte], from: Int, until: Int,
        want: String): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= until) {
        val size32 = be32(b, i)
        val (payload, end) =
          if (size32 == 1L && i + 16 <= until) (i + 16L, i + be64(b, i + 8))
          else if (size32 == 0L) (i + 8L, until.toLong) // box runs to EOF
          else (i + 8L, i + size32)
        if (end <= i || end > until || payload > end)
          throw new IllegalArgumentException(
            s"corrupt box size at offset $i (size=$size32)")
        if (boxType(b, i) == want) return Some((payload.toInt, end.toInt))
        i = end.toInt
      }
      None
    }

    def decode(r: MediaRecord): MediaFeatures =
      // A truncated payload can cut a structurally-valid box short; any
      // resulting out-of-range read is the same corrupt-container class
      // as a bad box size — one loud, typed failure, never a raw index
      // error escaping into the task.
      try decodeChecked(r)
      catch {
        case _: IndexOutOfBoundsException =>
          throw new IllegalArgumentException(
            s"media_id=${r.media_id}: truncated ISO BMFF payload " +
              s"(${r.payload.length} bytes)")
      }

    private def decodeChecked(r: MediaRecord): MediaFeatures = {
      val b = r.payload
      def fail(msg: String) = throw new IllegalArgumentException(
        s"media_id=${r.media_id}: $msg (${b.length} bytes)")
      if (b.length < 16 || !Set("ftyp", "moov", "mdat", "free", "wide", "skip")
          .contains(boxType(b, 0)))
        fail("payload is not an ISO BMFF container")
      val (moovS, moovE) = findBox(b, 0, b.length, "moov")
        .getOrElse(fail("no moov box — not a playable MP4 header"))
      val (mvhdS, _) = findBox(b, moovS, moovE, "mvhd")
        .getOrElse(fail("moov has no mvhd box"))
      val (timescale, duration) = (b(mvhdS) & 0xff) match {
        case 0 => (be32(b, mvhdS + 12), be32(b, mvhdS + 16))
        case 1 => (be32(b, mvhdS + 20), be64(b, mvhdS + 24))
        case v => fail(s"unknown mvhd version $v")
      }
      if (timescale <= 0) fail("mvhd timescale is zero")
      // first trak whose tkhd has a non-zero 16.16 presentation size
      // (audio tracks carry 0x0); absent any, dimensions report 0
      val dims = Iterator.unfold(moovS) { i =>
        findBox(b, i, moovE, "trak").map { case (s, e) => ((s, e), e) }
      }.flatMap { case (ts, te) => findBox(b, ts, te, "tkhd") }
        .map { case (ks, _) =>
          val off = if ((b(ks) & 0xff) == 1) ks + 88 else ks + 76
          ((be32(b, off) >> 16).toInt, (be32(b, off + 4) >> 16).toInt)
        }
        .find { case (w, h) => w > 0 && h > 0 }
        .getOrElse((0, 0))
      val h = java.security.MessageDigest.getInstance("SHA-256").digest(b)
      MediaFeatures(
        media_id = r.media_id,
        modality = r.modality,
        byte_len = b.length,
        width = dims._1,
        height = dims._2,
        frames = (duration * 1000L / timescale).toInt, // duration_ms
        checksum = checksum(h))
    }
  }

  /** Production-shape registry: real header decode for all three
    * modalities — JDK image + audio codecs, box-walker MP4 video.
    */
  val imageIoRegistry: CodecRegistry =
    CodecRegistry(Seq(new ImageIoCodec, new JavaSoundCodec, new Mp4HeaderCodec))

  /** PIXEL-stage features — the raster decode's output: true raster
    * dimensions plus the 9×8-luma-grid dHash halves (the
    * [[PerceptualHash]] unit, split into non-negative 32-bit halves for
    * the engine-parity reasons documented there). This is the second
    * stage of the two-stage media scan: the HEADER stage
    * ([[extractFeatures]]) gates on metadata at a few hundred bytes per
    * record; the pixel stage below decodes full rasters and therefore
    * runs AFTER those gates, on the survivors only.
    */
  final case class PixelFeatures(
      media_id: Long,
      modality: String,
      width: Int,
      height: Int,
      h_hi: Long,
      h_lo: Long)

  /** Pixel-stage decoder: payload bytes → raster → perceptual features.
    * Same contract as [[MediaCodec]] (Serializable, stateless, ships in
    * the partition closure).
    */
  trait PixelCodec extends Serializable {
    def modalities: Set[String]
    def decode(r: MediaRecord): PixelFeatures
  }

  /** REAL raster decode via `javax.imageio.ImageIO.read` — the full
    * pixel path: decode the PNG/JPEG/GIF/BMP payload to a
    * `BufferedImage`, box-average to the 9×8 luma grid
    * ([[PerceptualHash.grayGrid]] — integer Rec.601, bit-deterministic),
    * and dHash it. A payload no reader decodes fails loudly, exactly
    * like the header codec: corrupt media must not flow on as fake
    * features.
    */
  final class ImageIoRasterCodec extends PixelCodec {
    val modalities: Set[String] = Set("image")
    def decode(r: MediaRecord): PixelFeatures = {
      imageIoNoDiskCache
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      if (img == null)
        throw new IllegalArgumentException(
          s"media_id=${r.media_id}: payload is not a decodable image " +
            s"(${r.payload.length} bytes)")
      val (hi, lo) = PerceptualHash.dHash64(PerceptualHash.grayGrid(img))
      PixelFeatures(r.media_id, r.modality, img.getWidth, img.getHeight,
        hi, lo)
    }
  }

  /** Modality→pixel-codec dispatch, same loud-failure semantics as
    * [[CodecRegistry]].
    */
  final case class PixelRegistry(codecs: Seq[PixelCodec]) {
    private[this] val byModality: Map[String, PixelCodec] = {
      val bindings = codecs.flatMap(c => c.modalities.iterator.map(_ -> c))
      val dups = bindings.groupBy(_._1).filter(_._2.size > 1).keys
      require(dups.isEmpty,
        s"modalities claimed by more than one pixel codec: ${dups.toSeq.sorted.mkString(", ")}")
      bindings.toMap
    }
    def decode(r: MediaRecord): PixelFeatures =
      byModality.getOrElse(r.modality, throw new IllegalArgumentException(
        s"no pixel codec registered for modality '${r.modality}' " +
          s"(media_id=${r.media_id}); registered: ${byModality.keys.toSeq.sorted.mkString(", ")}"))
        .decode(r)
  }

  /** One-time per-JVM: ImageIO's default is a FILE-cache stream — every
    * read/write round-trips a temp file on local disk, which at
    * thousands-of-tiny-rasters-per-task rates is pure I/O overhead (and a
    * tmp-dir dependency executors may not want). Memory-cache streams are
    * the right call for per-record decode; referenced by every ImageIO
    * call site so executors flip it before their first decode.
    */
  private[graft] lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** The real-raster image registry. Audio/video pixel stages register
    * their own codecs the same way (frame grabs need deployment codecs).
    */
  val rasterRegistry: PixelRegistry = PixelRegistry(Seq(new ImageIoRasterCodec))

  /** Deterministic 9×8 grayscale PNG whose pixel lumas are the CLOSED-FORM
    * `lumaAt(mediaId, r·9+c)` — the corpus generator that puts the REAL
    * encode→decode→grayGrid→dHash pixel path under the DuckDB hash gate
    * (`k5_image_real_dhash`): at exactly the 9×8 dHash grid size the
    * box-average is the identity (one pixel per cell) and integer Rec.601
    * luma of an r=g=b pixel is the value itself ((299+587+114)v/1000 = v),
    * so the decoded grid equals the formula and the oracle re-derives the
    * expected hash from first principles — no aux axiom, no surrogate.
    * PNG is lossless, so the round trip is bit-exact by construction.
    */
  def lumaAt(mediaId: Long, idx: Int): Int =
    ((mediaId * 7919L + idx * 104729L) % 256L).toInt

  def syntheticPngBytes(mediaId: Long): Array[Byte] = {
    imageIoNoDiskCache
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        val v = lumaAt(mediaId, r * 9 + c)
        img.setRGB(c, r, (v << 16) | (v << 8) | v)
        c += 1
      }
      r += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", out), "no PNG writer")
    out.toByteArray
  }

  /** Pixel-stage batch extraction: one partition = one batch, the raster
    * decoded inside the iterator so memory stays bounded at one image.
    * Output feeds [[PerceptualHash.nearDupPairs]] directly (h_hi/h_lo).
    */
  def extractPixelFeatures(
      records: Dataset[MediaRecord],
      registry: PixelRegistry = rasterRegistry): Dataset[PixelFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(registry.decode))
  }

  /** STUB decoder ??? replacement: deterministic fake decode. A real
    * implementation would dispatch on modality to an image/audio codec;
    * this derives plausible, reproducible dimensions from the payload hash
    * so downstream plumbing (grouping, joining, filtering on features) is
    * fully exercisable.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val h = java.security.MessageDigest.getInstance("SHA-256").digest(r.payload)
    def u16(i: Int): Int = ((h(i) & 0xff) << 8) | (h(i + 1) & 0xff)
    MediaFeatures(
      media_id = r.media_id,
      modality = r.modality,
      byte_len = r.payload.length,
      width = 64 + u16(0) % 1024,
      height = 64 + u16(2) % 1024,
      frames = if (r.modality == "video") 1 + u16(4) % 300 else 1,
      checksum = checksum(h))
  }

  /** Shared checksum format: first 8 bytes of SHA-256, hex — sampleFrames
    * and downstream joins key on it, so every codec must agree.
    */
  private def checksum(sha256: Array[Byte]): String =
    sha256.take(8).map("%02x".format(_)).mkString

  /** Batch feature extraction: one partition = one batch, decoder invoked
    * inside the iterator so memory stays bounded at one record. The codec
    * registry defaults to the stub; a real deployment passes its own.
    */
  def extractFeatures(
      records: Dataset[MediaRecord],
      registry: CodecRegistry = stubRegistry): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(registry.decode))
  }

  /** Resize: clamp decoded dimensions into a bounding box preserving aspect
    * ratio — the transform a real image resizer applies; here it operates
    * on the stub features (the decode itself being the stubbed step).
    */
  def resize(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  /** Frame sampling: every `everyN`-th frame index of a video record —
    * one output row per sampled frame, the explode shape a real frame
    * extractor produces (non-video records pass through as frame 0).
    */
  final case class FrameRef(media_id: Long, frame_idx: Int, checksum: String)

  def sampleFrames(features: Dataset[MediaFeatures], everyN: Int): Dataset[FrameRef] = {
    import features.sparkSession.implicits._
    features.flatMap { f =>
      if (f.modality == "video")
        (0 until f.frames by everyN).map(i => FrameRef(f.media_id, i, f.checksum))
      else Seq(FrameRef(f.media_id, 0, f.checksum))
    }
  }

  /** Build a deterministic media corpus from `documents` (payload = text
    * bytes; modality round-robins) — the test/bench input.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"),
        to_json(struct(col("lang"), col("source"), col("n_chars"))).as("meta_json"))
      .as[MediaRecord]
  }

  /** End-to-end: corpus → features DataFrame (used by SparkEntry/bench). */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(spark, dir))
      .toDF()
      .orderBy("media_id")
  }
}

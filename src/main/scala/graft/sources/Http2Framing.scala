package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

/** Minimal HTTP/2 framing (RFC 7540) + HPACK header compression
  * (RFC 7541), hand-implemented with zero dependencies — the transport
  * binding that completes the gRPC client stack whose two inner layers
  * [[ProtoWire]] already speaks (protobuf message encoding and gRPC
  * length-prefixed framing). The reference's intended live source is a
  * Yellowstone gRPC subscription it stubs to `Ok(vec![])`
  * (`/root/reference/adapters/src/solana_grpc.rs:17-24`); with this
  * layer, every byte of a real `application/grpc` exchange — connection
  * preface, SETTINGS, HPACK-compressed HEADERS, DATA frames carrying
  * ProtoWire frames, and the trailers HEADERS bearing `grpc-status` —
  * is constructible and parseable offline, golden-tested against the
  * RFC 7541 Appendix C vectors (the same ProtoWireSpec methodology).
  *
  * The connection-management half — the TCP socket, SETTINGS
  * negotiation, and WINDOW_UPDATE flow-control accounting — lives in
  * [[Http2GrpcClient]], which drives these codecs over a real
  * `java.net.Socket` (loopback-tested end-to-end incl. a mid-stream
  * flow-control stall in Http2LoopbackSpec). TLS remains deployment
  * wiring.
  *
  * Everything here is from the public RFCs: frame layout §4.1,
  * preface §3.5, HEADERS/DATA/SETTINGS §6, HPACK primitive integer
  * §5.1, string literals §5.2, binary format §6, static table
  * Appendix A, Huffman code Appendix B, worked examples Appendix C.
  */
object Http2Framing {

  /** Client connection preface (RFC 7540 §3.5). */
  val Preface: Array[Byte] = "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(US_ASCII)

  // frame types (RFC 7540 §6)
  val TData = 0x0
  val THeaders = 0x1
  val TPriority = 0x2
  val TRstStream = 0x3
  val TSettings = 0x4
  val TPushPromise = 0x5
  val TPing = 0x6
  val TGoAway = 0x7
  val TWindowUpdate = 0x8
  val TContinuation = 0x9

  // flags (per-type; only the ones this client uses)
  val FEndStream = 0x1
  val FAck = 0x1
  val FEndHeaders = 0x4
  val FPadded = 0x8

  // settings identifiers (RFC 7540 §6.5.2)
  val SettingsHeaderTableSize = 0x1
  val SettingsEnablePush = 0x2
  val SettingsMaxConcurrentStreams = 0x3
  val SettingsInitialWindowSize = 0x4
  val SettingsMaxFrameSize = 0x5
  val SettingsMaxHeaderListSize = 0x6

  /** The default flow-control window (§6.9.2): both the connection window
    * and every stream window start here until SETTINGS changes the
    * stream initial (the CONNECTION window is only ever grown by
    * WINDOW_UPDATE — INITIAL_WINDOW_SIZE does not apply to it).
    */
  val DefaultWindowSize = 65535

  /** One HTTP/2 frame: 9-byte header (24-bit length, type, flags,
    * 31-bit stream id) + payload (RFC 7540 §4.1).
    */
  final case class Frame(tpe: Int, flags: Int, streamId: Int, payload: Array[Byte]) {
    def has(flag: Int): Boolean = (flags & flag) != 0
  }

  def encodeFrame(f: Frame): Array[Byte] = {
    val len = f.payload.length
    require(len < (1 << 24), s"frame payload too large: $len")
    require(f.streamId >= 0, s"negative stream id ${f.streamId}")
    val out = new Array[Byte](9 + len)
    out(0) = (len >>> 16).toByte
    out(1) = (len >>> 8).toByte
    out(2) = len.toByte
    out(3) = f.tpe.toByte
    out(4) = f.flags.toByte
    out(5) = (f.streamId >>> 24).toByte
    out(6) = (f.streamId >>> 16).toByte
    out(7) = (f.streamId >>> 8).toByte
    out(8) = f.streamId.toByte
    System.arraycopy(f.payload, 0, out, 9, len)
    out
  }

  /** Decode every frame in `bytes` from `offset`; loud on a torn frame
    * (same torn-record rule as [[ProtoWire.frames]]).
    */
  def decodeFrames(bytes: Array[Byte], offset: Int = 0): Seq[Frame] = {
    val frames = Seq.newBuilder[Frame]
    var p = offset
    while (p < bytes.length) {
      require(p + 9 <= bytes.length,
        s"torn frame header at offset $p (${bytes.length - p} bytes left)")
      val len = ((bytes(p) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) | (bytes(p + 2) & 0xff)
      val tpe = bytes(p + 3) & 0xff
      val flags = bytes(p + 4) & 0xff
      val sid = ((bytes(p + 5) & 0x7f) << 24) | ((bytes(p + 6) & 0xff) << 16) |
        ((bytes(p + 7) & 0xff) << 8) | (bytes(p + 8) & 0xff)
      require(p + 9 + len <= bytes.length,
        s"torn frame payload at offset $p: declared $len, ${bytes.length - p - 9} left")
      frames += Frame(tpe, flags, sid,
        java.util.Arrays.copyOfRange(bytes, p + 9, p + 9 + len))
      p += 9 + len
    }
    frames.result()
  }

  /** Strip the client preface (when present) and decode the rest. */
  def decodeConnection(bytes: Array[Byte]): Seq[Frame] =
    if (bytes.length >= Preface.length &&
        java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(bytes, 0, Preface.length), Preface))
      decodeFrames(bytes, Preface.length)
    else decodeFrames(bytes)

  /** Read exactly ONE frame from a blocking stream — the socket-side twin
    * of [[decodeFrames]] (which needs the whole byte array up front).
    * Returns None on clean EOF at a frame boundary; loud on a torn
    * header or payload (EOF mid-frame), the same torn-record rule.
    */
  def readFrame(in: java.io.InputStream): Option[Frame] = {
    val first = in.read()
    if (first < 0) return None
    val hdr = new Array[Byte](9)
    hdr(0) = first.toByte
    var got = 1
    while (got < 9) {
      val n = in.read(hdr, got, 9 - got)
      require(n > 0, s"torn frame header (EOF after $got of 9 bytes)")
      got += n
    }
    val len = ((hdr(0) & 0xff) << 16) | ((hdr(1) & 0xff) << 8) | (hdr(2) & 0xff)
    val payload = new Array[Byte](len)
    var p = 0
    while (p < len) {
      val n = in.read(payload, p, len - p)
      require(n > 0, s"torn frame payload (EOF after $p of $len bytes)")
      p += n
    }
    Some(Frame(hdr(3) & 0xff, hdr(4) & 0xff,
      ((hdr(5) & 0x7f) << 24) | ((hdr(6) & 0xff) << 16) |
        ((hdr(7) & 0xff) << 8) | (hdr(8) & 0xff), payload))
  }

  /** Parse a SETTINGS payload back into (identifier, value) pairs. */
  def parseSettings(payload: Array[Byte]): Seq[(Int, Long)] = {
    require(payload.length % 6 == 0, s"bad SETTINGS length ${payload.length}")
    (0 until payload.length by 6).map { p =>
      val id = ((payload(p) & 0xff) << 8) | (payload(p + 1) & 0xff)
      val v = ((payload(p + 2) & 0xffL) << 24) | ((payload(p + 3) & 0xffL) << 16) |
        ((payload(p + 4) & 0xffL) << 8) | (payload(p + 5) & 0xffL)
      id -> v
    }
  }

  /** A WINDOW_UPDATE payload: one u31 increment (§6.9). */
  def windowUpdatePayload(increment: Int): Array[Byte] = {
    require(increment > 0 && increment <= 0x7fffffff,
      s"window increment out of range: $increment")
    Array(((increment >>> 24) & 0x7f).toByte, (increment >>> 16).toByte,
      (increment >>> 8).toByte, increment.toByte)
  }

  /** Parse a WINDOW_UPDATE payload's u31 increment. */
  def parseWindowUpdate(payload: Array[Byte]): Int = {
    require(payload.length == 4, s"bad WINDOW_UPDATE length ${payload.length}")
    ((payload(0) & 0x7f) << 24) | ((payload(1) & 0xff) << 16) |
      ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
  }

  /** A SETTINGS payload: (identifier u16, value u32) pairs (§6.5.1). */
  def settingsPayload(settings: Seq[(Int, Long)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    settings.foreach { case (id, v) =>
      out.write(id >>> 8); out.write(id)
      out.write((v >>> 24).toInt); out.write((v >>> 16).toInt)
      out.write((v >>> 8).toInt); out.write(v.toInt)
    }
    out.toByteArray
  }

  // =========================================================== HPACK ==

  object Hpack {

    /** Static table, RFC 7541 Appendix A — indexes 1..61. */
    val StaticTable: Vector[(String, String)] = Vector(
      ":authority" -> "", ":method" -> "GET", ":method" -> "POST",
      ":path" -> "/", ":path" -> "/index.html", ":scheme" -> "http",
      ":scheme" -> "https", ":status" -> "200", ":status" -> "204",
      ":status" -> "206", ":status" -> "304", ":status" -> "400",
      ":status" -> "404", ":status" -> "500", "accept-charset" -> "",
      "accept-encoding" -> "gzip, deflate", "accept-language" -> "",
      "accept-ranges" -> "", "accept" -> "",
      "access-control-allow-origin" -> "", "age" -> "", "allow" -> "",
      "authorization" -> "", "cache-control" -> "",
      "content-disposition" -> "", "content-encoding" -> "",
      "content-language" -> "", "content-length" -> "",
      "content-location" -> "", "content-range" -> "",
      "content-type" -> "", "cookie" -> "", "date" -> "", "etag" -> "",
      "expect" -> "", "expires" -> "", "from" -> "", "host" -> "",
      "if-match" -> "", "if-modified-since" -> "", "if-none-match" -> "",
      "if-range" -> "", "if-unmodified-since" -> "", "last-modified" -> "",
      "link" -> "", "location" -> "", "max-forwards" -> "",
      "proxy-authenticate" -> "", "proxy-authorization" -> "",
      "range" -> "", "referer" -> "", "refresh" -> "", "retry-after" -> "",
      "server" -> "", "set-cookie" -> "", "strict-transport-security" -> "",
      "transfer-encoding" -> "", "user-agent" -> "", "vary" -> "",
      "via" -> "", "www-authenticate" -> "")

    /** HPACK primitive integer, N-bit prefix (§5.1). `firstByteBits` are
      * the pattern bits above the prefix (e.g. 0x80 for an indexed
      * field's leading 1).
      */
    def encodeInt(out: ByteArrayOutputStream, value: Int, prefixBits: Int,
        firstByteBits: Int): Unit = {
      require(value >= 0, s"negative HPACK integer $value")
      val max = (1 << prefixBits) - 1
      if (value < max) out.write(firstByteBits | value)
      else {
        out.write(firstByteBits | max)
        var v = value - max
        while (v >= 128) { out.write((v % 128) | 0x80); v /= 128 }
        out.write(v)
      }
    }

    /** Decode an N-bit-prefix integer at `pos`; returns (value, nextPos). */
    def decodeInt(buf: Array[Byte], pos: Int, prefixBits: Int): (Int, Int) = {
      val max = (1 << prefixBits) - 1
      var p = pos
      var v = buf(p) & max
      p += 1
      if (v == max) {
        var shift = 0
        var more = true
        while (more) {
          require(p < buf.length, "torn HPACK integer")
          val b = buf(p) & 0xff
          p += 1
          v += (b & 0x7f) << shift
          shift += 7
          more = (b & 0x80) != 0
          require(shift <= 28, "HPACK integer overflow")
        }
      }
      (v, p)
    }

    /** Huffman code, RFC 7541 Appendix B: codes(sym) right-aligned,
      * bits(sym) code lengths, symbols 0..256 (256 = EOS).
      */
    object Huffman {
      val codes: Array[Int] = Array(
        0x1ff8, 0x7fffd8, 0xfffffe2, 0xfffffe3, 0xfffffe4, 0xfffffe5,
        0xfffffe6, 0xfffffe7, 0xfffffe8, 0xffffea, 0x3ffffffc, 0xfffffe9,
        0xfffffea, 0x3ffffffd, 0xfffffeb, 0xfffffec, 0xfffffed, 0xfffffee,
        0xfffffef, 0xffffff0, 0xffffff1, 0xffffff2, 0x3ffffffe, 0xffffff3,
        0xffffff4, 0xffffff5, 0xffffff6, 0xffffff7, 0xffffff8, 0xffffff9,
        0xffffffa, 0xffffffb, 0x14, 0x3f8, 0x3f9, 0xffa, 0x1ff9, 0x15,
        0xf8, 0x7fa, 0x3fa, 0x3fb, 0xf9, 0x7fb, 0xfa, 0x16, 0x17, 0x18,
        0x0, 0x1, 0x2, 0x19, 0x1a, 0x1b, 0x1c, 0x1d, 0x1e, 0x1f, 0x5c,
        0xfb, 0x7ffc, 0x20, 0xffb, 0x3fc, 0x1ffa, 0x21, 0x5d, 0x5e, 0x5f,
        0x60, 0x61, 0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a,
        0x6b, 0x6c, 0x6d, 0x6e, 0x6f, 0x70, 0x71, 0x72, 0xfc, 0x73, 0xfd,
        0x1ffb, 0x7fff0, 0x1ffc, 0x3ffc, 0x22, 0x7ffd, 0x3, 0x23, 0x4,
        0x24, 0x5, 0x25, 0x26, 0x27, 0x6, 0x74, 0x75, 0x28, 0x29, 0x2a,
        0x7, 0x2b, 0x76, 0x2c, 0x8, 0x9, 0x2d, 0x77, 0x78, 0x79, 0x7a,
        0x7b, 0x7ffe, 0x7fc, 0x3ffd, 0x1ffd, 0xffffffc, 0xfffe6,
        0x3fffd2, 0xfffe7, 0xfffe8, 0x3fffd3, 0x3fffd4, 0x3fffd5,
        0x7fffd9, 0x3fffd6, 0x7fffda, 0x7fffdb, 0x7fffdc, 0x7fffdd,
        0x7fffde, 0xffffeb, 0x7fffdf, 0xffffec, 0xffffed, 0x3fffd7,
        0x7fffe0, 0xffffee, 0x7fffe1, 0x7fffe2, 0x7fffe3, 0x7fffe4,
        0x1fffdc, 0x3fffd8, 0x7fffe5, 0x3fffd9, 0x7fffe6, 0x7fffe7,
        0xffffef, 0x3fffda, 0x1fffdd, 0xfffe9, 0x3fffdb, 0x3fffdc,
        0x7fffe8, 0x7fffe9, 0x1fffde, 0x7fffea, 0x3fffdd, 0x3fffde,
        0xfffff0, 0x1fffdf, 0x3fffdf, 0x7fffeb, 0x7fffec, 0x1fffe0,
        0x1fffe1, 0x3fffe0, 0x1fffe2, 0x7fffed, 0x3fffe1, 0x7fffee,
        0x7fffef, 0xfffea, 0x3fffe2, 0x3fffe3, 0x3fffe4, 0x7ffff0,
        0x3fffe5, 0x3fffe6, 0x7ffff1, 0x3ffffe0, 0x3ffffe1, 0xfffeb,
        0x7fff1, 0x3fffe7, 0x7ffff2, 0x3fffe8, 0x1ffffec, 0x3ffffe2,
        0x3ffffe3, 0x3ffffe4, 0x7ffffde, 0x7ffffdf, 0x3ffffe5, 0xfffff1,
        0x1ffffed, 0x7fff2, 0x1fffe3, 0x3ffffe6, 0x7ffffe0, 0x7ffffe1,
        0x3ffffe7, 0x7ffffe2, 0xfffff2, 0x1fffe4, 0x1fffe5, 0x3ffffe8,
        0x3ffffe9, 0xffffffd, 0x7ffffe3, 0x7ffffe4, 0x7ffffe5, 0xfffec,
        0xfffff3, 0xfffed, 0x1fffe6, 0x3fffe9, 0x1fffe7, 0x1fffe8,
        0x7ffff3, 0x3fffea, 0x3fffeb, 0x1ffffee, 0x1ffffef, 0xfffff4,
        0xfffff5, 0x3ffffea, 0x7ffff4, 0x3ffffeb, 0x7ffffe6, 0x3ffffec,
        0x3ffffed, 0x7ffffe7, 0x7ffffe8, 0x7ffffe9, 0x7ffffea, 0x7ffffeb,
        0xffffffe, 0x7ffffec, 0x7ffffed, 0x7ffffee, 0x7ffffef, 0x7fffff0,
        0x3ffffee, 0x3fffffff)
      val bits: Array[Int] = Array(
        13, 23, 28, 28, 28, 28, 28, 28, 28, 24, 30, 28, 28, 30, 28, 28,
        28, 28, 28, 28, 28, 28, 30, 28, 28, 28, 28, 28, 28, 28, 28, 28,
        6, 10, 10, 12, 13, 6, 8, 11, 10, 10, 8, 11, 8, 6, 6, 6,
        5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 7, 8, 15, 6, 12, 10,
        13, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
        7, 7, 7, 7, 7, 7, 7, 7, 8, 7, 8, 13, 19, 13, 14, 6,
        15, 5, 6, 5, 6, 5, 6, 6, 6, 5, 7, 7, 6, 6, 6, 5,
        6, 7, 6, 5, 5, 6, 7, 7, 7, 7, 7, 15, 11, 14, 13, 28,
        20, 22, 20, 20, 22, 22, 22, 23, 22, 23, 23, 23, 23, 23, 24, 23,
        24, 24, 22, 23, 24, 23, 23, 23, 23, 21, 22, 23, 22, 23, 23, 24,
        22, 21, 20, 22, 22, 23, 23, 21, 23, 22, 22, 24, 21, 22, 23, 23,
        21, 21, 22, 21, 23, 22, 23, 23, 20, 22, 22, 22, 23, 22, 22, 23,
        26, 26, 20, 19, 22, 23, 22, 25, 26, 26, 26, 27, 27, 26, 24, 25,
        19, 21, 26, 27, 27, 26, 27, 24, 21, 21, 26, 26, 28, 27, 27, 27,
        20, 24, 20, 21, 22, 21, 21, 23, 22, 22, 25, 25, 24, 24, 26, 23,
        26, 27, 26, 26, 27, 27, 27, 27, 27, 28, 27, 27, 27, 27, 27, 26,
        30)

      private lazy val decodeMap: Map[(Int, Long), Int] =
        (0 until 256).map(s => ((bits(s), codes(s).toLong), s)).toMap

      def encode(data: Array[Byte]): Array[Byte] = {
        val out = new ByteArrayOutputStream()
        var cur = 0L
        var nBits = 0
        data.foreach { b =>
          val s = b & 0xff
          cur = (cur << bits(s)) | (codes(s).toLong & 0xffffffffL)
          nBits += bits(s)
          while (nBits >= 8) {
            nBits -= 8
            out.write(((cur >>> nBits) & 0xff).toInt)
          }
        }
        // pad with EOS prefix (all-ones) per §5.2
        if (nBits > 0)
          out.write((((cur << (8 - nBits)) | ((1 << (8 - nBits)) - 1)) & 0xff).toInt)
        out.toByteArray
      }

      def decode(data: Array[Byte]): Array[Byte] = {
        val out = new ByteArrayOutputStream()
        var cur = 0L
        var nBits = 0
        data.foreach { b =>
          cur = (cur << 8) | (b & 0xff)
          nBits += 8
          var matched = true
          while (matched && nBits >= 5) {
            matched = false
            var len = 5
            while (len <= math.min(nBits, 30) && !matched) {
              decodeMap.get((len, (cur >>> (nBits - len)) & ((1L << len) - 1))) match {
                case Some(sym) =>
                  out.write(sym)
                  nBits -= len
                  cur &= (1L << nBits) - 1
                  matched = true
                case None => len += 1
              }
            }
          }
        }
        // remaining bits must be a prefix of EOS (all ones, < 8 bits)
        require(nBits < 8 && (nBits == 0 || (cur & ((1L << nBits) - 1)) == (1L << nBits) - 1),
          s"invalid Huffman padding ($nBits bits 0x${cur.toHexString})")
        out.toByteArray
      }
    }

    private def encodeString(out: ByteArrayOutputStream, s: String,
        huffman: Boolean): Unit = {
      val raw = s.getBytes(UTF_8)
      if (huffman) {
        val h = Huffman.encode(raw)
        encodeInt(out, h.length, 7, 0x80)
        out.write(h, 0, h.length)
      } else {
        encodeInt(out, raw.length, 7, 0x00)
        out.write(raw, 0, raw.length)
      }
    }

    private def decodeString(buf: Array[Byte], pos: Int): (String, Int) = {
      val huff = (buf(pos) & 0x80) != 0
      val (len, p) = decodeInt(buf, pos, 7)
      require(p + len <= buf.length, "torn HPACK string")
      val raw = java.util.Arrays.copyOfRange(buf, p, p + len)
      (new String(if (huff) Huffman.decode(raw) else raw, UTF_8), p + len)
    }

    /** Entry size for table bookkeeping: name + value + 32 (§4.1). */
    private def entrySize(e: (String, String)): Int =
      e._1.getBytes(UTF_8).length + e._2.getBytes(UTF_8).length + 32

    /** The shared dynamic table: newest entry at the head (index 62). */
    private final class DynTable(var maxSize: Int) {
      val entries = scala.collection.mutable.ArrayDeque.empty[(String, String)]
      var size = 0
      def add(e: (String, String)): Unit = {
        entries.prepend(e)
        size += entrySize(e)
        evict()
      }
      def resize(n: Int): Unit = { maxSize = n; evict() }
      private def evict(): Unit =
        while (size > maxSize && entries.nonEmpty) {
          size -= entrySize(entries.removeLast())
        }
      /** 1-based HPACK index → entry (static below 62). */
      def lookup(idx: Int): (String, String) = {
        require(idx >= 1, s"HPACK index $idx out of range")
        if (idx <= StaticTable.length) StaticTable(idx - 1)
        else {
          val d = idx - StaticTable.length - 1
          require(d < entries.length, s"HPACK index $idx beyond table")
          entries(d)
        }
      }
      def indexOf(name: String, value: String): Int = {
        val s = StaticTable.indexWhere(e => e._1 == name && e._2 == value)
        if (s >= 0) return s + 1
        val d = entries.indexWhere(e => e._1 == name && e._2 == value)
        if (d >= 0) d + StaticTable.length + 1 else -1
      }
      def indexOfName(name: String): Int = {
        val s = StaticTable.indexWhere(_._1 == name)
        if (s >= 0) return s + 1
        val d = entries.indexWhere(_._1 == name)
        if (d >= 0) d + StaticTable.length + 1 else -1
      }
    }

    /** HPACK encoder with the standard greedy strategy: full-match →
      * indexed field; otherwise literal WITH incremental indexing
      * (indexed or new name) — exactly the RFC Appendix C.3/C.4 request
      * traces, which the spec replays byte-for-byte (huffman toggles
      * between the C.3 and C.4 encodings).
      */
    final class Encoder(maxTableSize: Int = 4096, huffman: Boolean = false) {
      private val table = new DynTable(maxTableSize)

      def encode(headers: Seq[(String, String)]): Array[Byte] = {
        val out = new ByteArrayOutputStream()
        headers.foreach { case (name, value) =>
          val full = table.indexOf(name, value)
          if (full > 0) encodeInt(out, full, 7, 0x80) // §6.1 indexed
          else {
            val nameIdx = table.indexOfName(name)
            if (nameIdx > 0) encodeInt(out, nameIdx, 6, 0x40) // §6.2.1
            else {
              out.write(0x40)
              encodeString(out, name, huffman)
            }
            encodeString(out, value, huffman)
            table.add(name -> value)
          }
        }
        out.toByteArray
      }

      /** Dynamic-table snapshot (newest first), for table-evolution
        * assertions against the RFC traces.
        */
      def tableEntries: Seq[(String, String)] = table.entries.toSeq
      def tableSize: Int = table.size
    }

    /** HPACK decoder — full §6 surface: indexed, all three literal
      * forms, and dynamic table size updates.
      */
    final class Decoder(maxTableSize: Int = 4096) {
      private val table = new DynTable(maxTableSize)

      def decode(block: Array[Byte]): Seq[(String, String)] = {
        val out = Seq.newBuilder[(String, String)]
        var p = 0
        while (p < block.length) {
          val b = block(p) & 0xff
          if ((b & 0x80) != 0) { // §6.1 indexed header field
            val (idx, np) = decodeInt(block, p, 7)
            require(idx != 0, "indexed field with index 0")
            out += table.lookup(idx)
            p = np
          } else if ((b & 0xc0) == 0x40) { // §6.2.1 literal, incremental
            val (idx, np) = decodeInt(block, p, 6)
            val (name, p2) =
              if (idx == 0) decodeString(block, np)
              else (table.lookup(idx)._1, np)
            val (value, p3) = decodeString(block, p2)
            out += (name -> value)
            table.add(name -> value)
            p = p3
          } else if ((b & 0xe0) == 0x20) { // §6.3 table size update
            val (n, np) = decodeInt(block, p, 5)
            table.resize(n)
            p = np
          } else { // §6.2.2 (0000) without indexing / §6.2.3 (0001) never
            val (idx, np) = decodeInt(block, p, 4)
            val (name, p2) =
              if (idx == 0) decodeString(block, np)
              else (table.lookup(idx)._1, np)
            val (value, p3) = decodeString(block, p2)
            out += (name -> value)
            p = p3
          }
        }
        out.result()
      }

      def tableEntries: Seq[(String, String)] = table.entries.toSeq
      def tableSize: Int = table.size
    }
  }

  // ============================================== gRPC-over-h2 bytes ==

  /** The gRPC HTTP/2 binding (grpc.io PROTOCOL-HTTP2): compose/parse a
    * complete unary-or-streaming exchange as raw connection bytes, with
    * [[ProtoWire]] supplying the inner message framing.
    */
  object GrpcH2 {

    /** Build the full client-side byte stream for one RPC: preface,
      * empty SETTINGS, HEADERS (HPACK, END_HEADERS), one DATA frame per
      * gRPC message (each wrapped in ProtoWire's length-prefixed frame),
      * END_STREAM on the last DATA (half-close; an empty request
      * half-closes on an empty DATA frame).
      */
    def request(path: String, authority: String,
        messages: Seq[Array[Byte]], streamId: Int = 1,
        huffman: Boolean = false): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(Preface, 0, Preface.length)
      out.write(encodeFrame(Frame(TSettings, 0, 0, Array.empty)))
      val enc = new Hpack.Encoder(huffman = huffman)
      val headerBlock = enc.encode(Seq(
        ":method" -> "POST", ":scheme" -> "http", ":path" -> path,
        ":authority" -> authority, "content-type" -> "application/grpc",
        "te" -> "trailers"))
      out.write(encodeFrame(Frame(THeaders, FEndHeaders, streamId, headerBlock)))
      if (messages.isEmpty)
        out.write(encodeFrame(Frame(TData, FEndStream, streamId, Array.empty)))
      else messages.zipWithIndex.foreach { case (m, i) =>
        val framed = new ByteArrayOutputStream()
        ProtoWire.writeFrame(framed, m)
        val fl = if (i == messages.length - 1) FEndStream else 0
        out.write(encodeFrame(Frame(TData, fl, streamId, framed.toByteArray)))
      }
      out.toByteArray
    }

    /** Build a server response byte stream (for tests and stub servers):
      * SETTINGS ack-less exchange elided to one empty SETTINGS, HEADERS
      * (:status 200, content-type), DATA frames, trailers HEADERS with
      * END_STREAM carrying grpc-status.
      */
    def response(messages: Seq[Array[Byte]], grpcStatus: Int = 0,
        streamId: Int = 1, huffman: Boolean = false): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(encodeFrame(Frame(TSettings, 0, 0, Array.empty)))
      val enc = new Hpack.Encoder(huffman = huffman)
      out.write(encodeFrame(Frame(THeaders, FEndHeaders, streamId,
        enc.encode(Seq(":status" -> "200",
          "content-type" -> "application/grpc")))))
      messages.foreach { m =>
        val framed = new ByteArrayOutputStream()
        ProtoWire.writeFrame(framed, m)
        out.write(encodeFrame(Frame(TData, 0, streamId, framed.toByteArray)))
      }
      out.write(encodeFrame(Frame(THeaders, FEndHeaders | FEndStream, streamId,
        enc.encode(Seq("grpc-status" -> grpcStatus.toString)))))
      out.toByteArray
    }

    final case class ParsedRpc(
        headers: Seq[(String, String)],
        messages: Seq[Array[Byte]],
        trailers: Seq[(String, String)]) {
      def header(name: String): Option[String] =
        headers.collectFirst { case (n, v) if n == name => v }
      def trailer(name: String): Option[String] =
        trailers.collectFirst { case (n, v) if n == name => v }
      def grpcStatus: Option[Int] =
        (trailer("grpc-status") orElse header("grpc-status")).map(_.toInt)
    }

    /** Parse one side's byte stream for `streamId`: decode frames, run
      * HPACK over HEADERS in connection order (the HPACK contract: one
      * decoder per connection), reassemble the DATA bytes, and split
      * them through [[ProtoWire.frames]]. The HEADERS frame that ends
      * the stream (or follows data) is the trailers block. Loud on torn
      * frames and on CONTINUATION (this minimal client never emits
      * header blocks above one frame, and parsing a fragmented block
      * without it would mis-order the HPACK state).
      */
    def parse(bytes: Array[Byte], streamId: Int = 1): ParsedRpc = {
      val dec = new Hpack.Decoder()
      var headers = Seq.empty[(String, String)]
      var trailers = Seq.empty[(String, String)]
      var sawHeaders = false
      val data = new ByteArrayOutputStream()
      decodeConnection(bytes).foreach { f =>
        require(f.tpe != TContinuation,
          "CONTINUATION frames unsupported: single-frame header blocks only")
        f.tpe match {
          case THeaders if f.streamId == streamId =>
            require(f.has(FEndHeaders), "fragmented header block (no END_HEADERS)")
            val hs = dec.decode(f.payload)
            if (!sawHeaders) { headers = hs; sawHeaders = true }
            else trailers = hs
          case TData if f.streamId == streamId =>
            data.write(f.payload, 0, f.payload.length)
          case THeaders =>
            // other streams still advance the shared HPACK state
            dec.decode(f.payload): Unit
          case _ => // SETTINGS/PING/WINDOW_UPDATE/...: connection plumbing
        }
      }
      val msgs = ProtoWire.frames(
        new java.io.ByteArrayInputStream(data.toByteArray)).toSeq
      ParsedRpc(headers, msgs, trailers)
    }
  }
}

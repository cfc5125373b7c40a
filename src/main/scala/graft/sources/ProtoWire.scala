package graft.sources

import java.io.{EOFException, InputStream, OutputStream}

/** The gRPC/protobuf WIRE FORMAT, hand-implemented — the decided answer
  * to the reference's declared-but-stubbed live path: its intended
  * source is a Yellowstone gRPC subscription (`/root/reference/README.md:3`,
  * deps `yellowstone-grpc-client/-proto` in `adapters/Cargo.toml:8-9`)
  * whose adapter the reference itself stubs to `Ok(vec![])`
  * (`adapters/src/solana_grpc.rs:17-24`).
  *
  * Scope decision, recorded: this engine speaks the two WIRE layers —
  * protobuf message encoding (varints, tags, length-delimited fields;
  * the format is public: protobuf.dev/programming-guides/encoding) and
  * gRPC's length-prefixed message framing (1-byte compressed flag +
  * 4-byte big-endian length; grpc.io PROTOCOL-HTTP2 spec) — as a
  * dependency-free codec, tested against hand-computed byte vectors.
  * The HTTP/2 TRANSPORT binding (RFC 7540 frames + RFC 7541 HPACK,
  * trailers carrying `grpc-status`) lives in [[Http2Framing]], golden
  * -tested against the RFC Appendix C vectors — together the three
  * layers compose a complete `application/grpc` exchange offline
  * ([[Http2Framing.GrpcH2]]); only the TCP/TLS socket and flow-control
  * bookkeeping remain deployment wiring. A framed protobuf stream over
  * any byte transport (socket, file, pipe) is fully consumable via
  * [[ProtoWire.frames]] + [[ProtoWire.Message]], which is the layer a
  * real Yellowstone session would hand to the engine's existing
  * ingestion plumbing ([[SlotLogSource]] / `EventStreams.subscribeSocket`).
  *
  * Decoding is permissive where the engine's per-item error-skip
  * contract wants it (unknown fields are skipped by wire type, exactly
  * per spec) and LOUD where silence would corrupt (truncated varints,
  * frames past the stream's end, the unsupported compressed flag).
  */
object ProtoWire {

  /** Wire types (protobuf encoding spec §"Message Structure"). */
  val WireVarint = 0
  val WireFixed64 = 1
  val WireLenDelim = 2
  val WireFixed32 = 5

  final case class Field(number: Int, wireType: Int, varint: Long, bytes: Array[Byte]) {
    def utf8: String = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** A decoded protobuf message: fields in wire order, with accessors
    * that take the LAST occurrence (proto3 semantics for repeated scalar
    * overwrites) or all occurrences (repeated fields).
    */
  final case class Message(fields: Seq[Field]) {
    def all(number: Int): Seq[Field] = fields.filter(_.number == number)
    def varint(number: Int): Option[Long] =
      all(number).filter(_.wireType == WireVarint).lastOption.map(_.varint)
    def bytes(number: Int): Option[Array[Byte]] =
      all(number).filter(_.wireType == WireLenDelim).lastOption.map(_.bytes)
    def string(number: Int): Option[String] = bytes(number).map(b =>
      new String(b, java.nio.charset.StandardCharsets.UTF_8))
    def message(number: Int): Option[Message] = bytes(number).map(decode)
  }

  // ---- varints ----

  def writeVarint(out: OutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write((v & 0x7f).toInt)
  }

  /** Reads one varint; throws EOFException on a truncated stream and
    * rejects encodings past 10 bytes (the 64-bit maximum) loudly.
    */
  def readVarint(in: InputStream): Long = {
    var shift = 0
    var result = 0L
    while (shift < 64) {
      val b = in.read()
      if (b < 0) throw new EOFException("truncated varint")
      result |= (b.toLong & 0x7f) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
    }
    throw new IllegalArgumentException("varint exceeds 10 bytes")
  }

  def zigzagEncode(n: Long): Long = (n << 1) ^ (n >> 63)
  def zigzagDecode(n: Long): Long = (n >>> 1) ^ -(n & 1)

  // ---- messages ----

  /** Append one field to a message under construction. */
  def writeVarintField(out: OutputStream, number: Int, value: Long): Unit = {
    writeVarint(out, (number.toLong << 3) | WireVarint)
    writeVarint(out, value)
  }

  def writeBytesField(out: OutputStream, number: Int, value: Array[Byte]): Unit = {
    writeVarint(out, (number.toLong << 3) | WireLenDelim)
    writeVarint(out, value.length.toLong)
    out.write(value)
  }

  def writeStringField(out: OutputStream, number: Int, value: String): Unit =
    writeBytesField(out, number, value.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Decode a complete protobuf message from `bytes`. Unknown fields are
    * retained (callers skip by not asking for them); unknown WIRE TYPES
    * and truncation throw — a malformed message is one item's error, and
    * the per-item skip belongs to the CALLER (solana.rs:51-53 contract),
    * not silently inside the codec.
    */
  def decode(bytes: Array[Byte]): Message = {
    val in = new java.io.ByteArrayInputStream(bytes)
    val fields = Seq.newBuilder[Field]
    while (in.available() > 0) {
      val tag = readVarint(in)
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      require(number > 0, s"invalid field number $number")
      wt match {
        case WireVarint =>
          fields += Field(number, wt, readVarint(in), Array.emptyByteArray)
        case WireFixed64 =>
          val b = in.readNBytes(8)
          if (b.length != 8) throw new EOFException("truncated fixed64")
          fields += Field(number, wt,
            java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong, b)
        case WireFixed32 =>
          val b = in.readNBytes(4)
          if (b.length != 4) throw new EOFException("truncated fixed32")
          fields += Field(number, wt,
            java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong, b)
        case WireLenDelim =>
          val len = readVarint(in)
          require(len >= 0 && len <= Int.MaxValue, s"bad length $len")
          val b = in.readNBytes(len.toInt)
          if (b.length != len) throw new EOFException("truncated length-delimited field")
          fields += Field(number, wt, len, b)
        case other =>
          throw new IllegalArgumentException(s"unsupported wire type $other (field $number)")
      }
    }
    Message(fields.result())
  }

  // ---- gRPC length-prefixed framing ----

  /** Write one gRPC data frame: flag 0 (uncompressed) + u32 big-endian
    * length + payload.
    */
  def writeFrame(out: OutputStream, payload: Array[Byte]): Unit = {
    out.write(0)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(payload.length).array())
    out.write(payload)
  }

  /** Lazily decode a stream of gRPC frames into message payloads.
    * Stops cleanly at end-of-stream BETWEEN frames; a stream ending
    * inside a frame throws (a half-delivered message must never be
    * served — same torn-record rule as [[SlotLogSource]]). The
    * compressed flag (1) is rejected loudly: this codec does not
    * negotiate compression, and skipping such a frame would silently
    * drop data.
    */
  def frames(in: InputStream): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var nextFrame: Array[Byte] = _
    private var done = false
    private def advance(): Unit = {
      if (done || nextFrame != null) return
      val flag = in.read()
      if (flag < 0) { done = true; return }
      require(flag == 0, s"unsupported gRPC frame flag $flag (compressed frames not negotiated)")
      val hdr = in.readNBytes(4)
      if (hdr.length != 4) throw new EOFException("truncated gRPC frame header")
      val len = java.nio.ByteBuffer.wrap(hdr).getInt
      require(len >= 0, s"bad frame length $len")
      val body = in.readNBytes(len)
      if (body.length != len) throw new EOFException(
        s"truncated gRPC frame: expected $len bytes, got ${body.length}")
      nextFrame = body
    }
    override def hasNext: Boolean = { advance(); nextFrame != null }
    override def next(): Array[Byte] = {
      advance()
      if (nextFrame == null) throw new NoSuchElementException
      val f = nextFrame; nextFrame = null; f
    }
  }

  // ---- the Yellowstone-shaped bridge ----

  /** Slot-update message shape for the subscription bridge: a framed
    * stream of `(slot: varint @1, payload: bytes @2)` messages — the
    * minimal slot-cursored envelope a Yellowstone-style subscription
    * carries (slot for resume bookkeeping, an opaque payload for the
    * downstream parser). Field numbers are this bridge's own declared
    * schema, not a claim about yellowstone-grpc-proto's (which the
    * reference never exercises — its adapter returns `Ok(vec![])`).
    */
  def writeSlotUpdate(out: OutputStream, slot: Long, payload: String): Unit = {
    val msg = new java.io.ByteArrayOutputStream()
    writeVarintField(msg, 1, slot)
    writeStringField(msg, 2, payload)
    writeFrame(out, msg.toByteArray)
  }

  /** Decode a framed subscription stream into (slot, payload) records —
    * the exact shape `slotlog` lines and `subscribeSocket` events carry,
    * so a real gRPC byte stream plugs into the existing ingestion path.
    * A message missing either field is a per-item skip (returns None in
    * place, caller filters) — the reference's log-and-skip contract.
    */
  def readSlotUpdates(in: InputStream): Iterator[Option[(Long, String)]] =
    frames(in).map { payload =>
      try {
        val m = decode(payload)
        for (slot <- m.varint(1); body <- m.string(2)) yield (slot, body)
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"Skipping malformed subscription message: ${e.getMessage}")
          None
      }
    }
}

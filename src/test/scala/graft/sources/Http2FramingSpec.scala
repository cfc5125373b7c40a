package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import Http2Framing._
import Http2Framing.Hpack._

/** HTTP/2 framing + HPACK against the PUBLIC RFC test vectors:
  * RFC 7541 Appendix C worked examples byte-for-byte (integers C.1,
  * literal forms C.2, request traces C.3 plain / C.4 Huffman, response
  * traces with eviction C.5 plain / C.6 Huffman, including the dynamic
  * table evolution each trace documents), plus frame-layer round-trips
  * and the composed gRPC exchange over [[ProtoWire]] — the same
  * golden-vector methodology as ProtoWireSpec.
  */
class Http2FramingSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s+", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def toHex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  // ---- C.1: integer representation ----

  test("C.1 primitive integers: 10 in 5 bits, 1337 in 5 bits, 42 in 8 bits") {
    def enc(v: Int, prefix: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      encodeInt(o, v, prefix, 0)
      o.toByteArray
    }
    assert(toHex(enc(10, 5)) == "0a")
    assert(toHex(enc(1337, 5)) == "1f9a0a")
    assert(toHex(enc(42, 8)) == "2a")
    assert(decodeInt(hex("0a"), 0, 5) == ((10, 1)))
    assert(decodeInt(hex("1f9a0a"), 0, 5) == ((1337, 3)))
    assert(decodeInt(hex("2a"), 0, 8) == ((42, 1)))
  }

  // ---- C.2: literal field forms (decoder) ----

  test("C.2.1 literal with incremental indexing, new name") {
    val d = new Decoder()
    val hs = d.decode(hex(
      "400a 6375 7374 6f6d 2d6b 6579 0d63 7573 746f 6d2d 6865 6164 6572"))
    assert(hs == Seq("custom-key" -> "custom-header"))
    assert(d.tableEntries == Seq("custom-key" -> "custom-header"))
    assert(d.tableSize == 55)
  }

  test("C.2.2 literal without indexing (indexed name) leaves the table empty") {
    val d = new Decoder()
    assert(d.decode(hex("040c 2f73 616d 706c 652f 7061 7468")) ==
      Seq(":path" -> "/sample/path"))
    assert(d.tableEntries.isEmpty)
  }

  test("C.2.3 literal never indexed") {
    val d = new Decoder()
    assert(d.decode(hex("1008 7061 7373 776f 7264 0673 6563 7265 74")) ==
      Seq("password" -> "secret"))
    assert(d.tableEntries.isEmpty)
  }

  test("C.2.4 indexed header field from the static table") {
    val d = new Decoder()
    assert(d.decode(hex("82")) == Seq(":method" -> "GET"))
  }

  // ---- C.3 / C.4: request traces, one encoder/decoder per connection ----

  private val req1 = Seq(":method" -> "GET", ":scheme" -> "http",
    ":path" -> "/", ":authority" -> "www.example.com")
  private val req2 = req1 :+ ("cache-control" -> "no-cache")
  private val req3 = Seq(":method" -> "GET", ":scheme" -> "https",
    ":path" -> "/index.html", ":authority" -> "www.example.com",
    "custom-key" -> "custom-value")

  test("C.3 request trace without Huffman: bytes and table evolution") {
    val e = new Encoder(huffman = false)
    assert(toHex(e.encode(req1)) ==
      "828684410f7777772e6578616d706c652e636f6d")
    assert(e.tableEntries == Seq(":authority" -> "www.example.com"))
    assert(e.tableSize == 57)
    assert(toHex(e.encode(req2)) == "828684be58086e6f2d6361636865")
    assert(e.tableSize == 110)
    assert(toHex(e.encode(req3)) ==
      "828785bf400a637573746f6d2d6b65790c637573746f6d2d76616c7565")
    assert(e.tableEntries == Seq("custom-key" -> "custom-value",
      "cache-control" -> "no-cache", ":authority" -> "www.example.com"))
    assert(e.tableSize == 164)
    // and the decoder walks the same connection back
    val d = new Decoder()
    assert(d.decode(hex("828684410f7777772e6578616d706c652e636f6d")) == req1)
    assert(d.decode(hex("828684be58086e6f2d6361636865")) == req2)
    assert(d.decode(hex(
      "828785bf400a637573746f6d2d6b65790c637573746f6d2d76616c7565")) == req3)
    assert(d.tableSize == 164)
  }

  test("C.4 request trace with Huffman: bytes, decode, table evolution") {
    val e = new Encoder(huffman = true)
    assert(toHex(e.encode(req1)) == "828684418cf1e3c2e5f23a6ba0ab90f4ff")
    assert(toHex(e.encode(req2)) == "828684be5886a8eb10649cbf")
    assert(toHex(e.encode(req3)) ==
      "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf")
    assert(e.tableSize == 164)
    val d = new Decoder()
    assert(d.decode(hex("828684418cf1e3c2e5f23a6ba0ab90f4ff")) == req1)
    assert(d.decode(hex("828684be5886a8eb10649cbf")) == req2)
    assert(d.decode(hex(
      "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf")) == req3)
  }

  // ---- C.5 / C.6: response traces with table size 256 (eviction) ----

  private val resp1 = Seq(":status" -> "302", "cache-control" -> "private",
    "date" -> "Mon, 21 Oct 2013 20:13:21 GMT",
    "location" -> "https://www.example.com")
  private val resp2 = resp1.map { case (n, v) =>
    if (n == ":status") (n, "307") else (n, v)
  }
  private val resp3 = Seq(":status" -> "200", "cache-control" -> "private",
    "date" -> "Mon, 21 Oct 2013 20:13:22 GMT",
    "location" -> "https://www.example.com",
    "content-encoding" -> "gzip",
    "set-cookie" -> "foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1")

  test("C.5 response trace without Huffman: eviction at table size 256") {
    val e = new Encoder(maxTableSize = 256, huffman = false)
    assert(toHex(e.encode(resp1)) ==
      "4803333032580770726976617465611d4d6f6e2c203231204f637420323031332032303a31333a323120474d546e1768747470733a2f2f7777772e6578616d706c652e636f6d")
    assert(e.tableSize == 222)
    assert(toHex(e.encode(resp2)) == "4803333037c1c0bf")
    // :status 302 evicted by :status 307
    assert(e.tableEntries.head == (":status" -> "307"))
    assert(!e.tableEntries.contains(":status" -> "302"))
    assert(e.tableSize == 222)
    assert(toHex(e.encode(resp3)) ==
      "88c1611d4d6f6e2c203231204f637420323031332032303a31333a323220474d54c05a04677a69707738666f6f3d4153444a4b48514b425a584f5157454f50495541585157454f49553b206d61782d6167653d333630303b2076657273696f6e3d31")
    assert(e.tableSize == 215)
    assert(e.tableEntries.map(_._1) == Seq("set-cookie", "content-encoding", "date"))
    val d = new Decoder(maxTableSize = 256)
    assert(d.decode(hex("4803333032580770726976617465611d4d6f6e2c203231204f637420323031332032303a31333a323120474d546e1768747470733a2f2f7777772e6578616d706c652e636f6d")) == resp1)
    assert(d.decode(hex("4803333037c1c0bf")) == resp2)
    assert(d.decode(hex("88c1611d4d6f6e2c203231204f637420323031332032303a31333a323220474d54c05a04677a69707738666f6f3d4153444a4b48514b425a584f5157454f50495541585157454f49553b206d61782d6167653d333630303b2076657273696f6e3d31")) == resp3)
    assert(d.tableSize == 215)
  }

  test("C.6 response trace with Huffman: same evolution, Huffman strings") {
    val e = new Encoder(maxTableSize = 256, huffman = true)
    assert(toHex(e.encode(resp1)) ==
      "488264025885aec3771a4b6196d07abe941054d444a8200595040b8166e082a62d1bff6e919d29ad171863c78f0b97c8e9ae82ae43d3")
    assert(e.tableSize == 222)
    assert(toHex(e.encode(resp2)) == "4883640effc1c0bf")
    assert(toHex(e.encode(resp3)) ==
      "88c16196d07abe941054d444a8200595040b8166e084a62d1bffc05a839bd9ab77ad94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1ab270fb5291f9587316065c003ed4ee5b1063d5007")
    assert(e.tableSize == 215)
    val d = new Decoder(maxTableSize = 256)
    assert(d.decode(hex("488264025885aec3771a4b6196d07abe941054d444a8200595040b8166e082a62d1bff6e919d29ad171863c78f0b97c8e9ae82ae43d3")) == resp1)
    assert(d.decode(hex("4883640effc1c0bf")) == resp2)
    assert(d.decode(hex("88c16196d07abe941054d444a8200595040b8166e084a62d1bffc05a839bd9ab77ad94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1ab270fb5291f9587316065c003ed4ee5b1063d5007")) == resp3)
  }

  test("Huffman round-trips arbitrary byte strings, including non-ASCII") {
    val samples = Seq("www.example.com", "no-cache", "", "a",
      "Mon, 21 Oct 2013 20:13:21 GMT", "päylöad-ünïcode ÿ")
    samples.foreach { s =>
      val raw = s.getBytes("UTF-8")
      assert(Huffman.decode(Huffman.encode(raw)).toSeq == raw.toSeq, s)
    }
    // every single byte value survives
    val all = Array.tabulate[Byte](256)(_.toByte)
    assert(Huffman.decode(Huffman.encode(all)).toSeq == all.toSeq)
  }

  test("decoder honors dynamic table size update instructions") {
    val d = new Decoder()
    d.decode(hex("400a 6375 7374 6f6d 2d6b 6579 0d63 7573 746f 6d2d 6865 6164 6572")): Unit
    assert(d.tableSize == 55)
    // 001xxxxx with value 0 clears the table; then restore to 4096
    assert(d.decode(hex("20")).isEmpty)
    assert(d.tableSize == 0 && d.tableEntries.isEmpty)
  }

  // ---- frame layer ----

  test("frame encode/decode round-trip, preface stripping, torn-frame loudness") {
    val fs = Seq(
      Frame(TSettings, 0, 0, Array.empty),
      Frame(THeaders, FEndHeaders, 1, hex("82")),
      Frame(TData, FEndStream, 1, "payload".getBytes))
    val bytes = Preface ++ fs.flatMap(encodeFrame)
    val back = decodeConnection(bytes)
    assert(back.map(f => (f.tpe, f.flags, f.streamId)) ==
      fs.map(f => (f.tpe, f.flags, f.streamId)))
    assert(back(2).payload.toSeq == "payload".getBytes.toSeq)
    intercept[IllegalArgumentException] {
      decodeFrames(bytes.slice(Preface.length, bytes.length - 3))
    }
    // settings payload: (id, value) pairs, 6 bytes each
    assert(toHex(settingsPayload(Seq(4 -> 65535L, 3 -> 100L))) ==
      "0004 0000ffff 0003 00000064".replaceAll(" ", ""))
  }

  // ---- the composed gRPC exchange ----

  test("gRPC request/response over h2 framing round-trips ProtoWire messages") {
    def slotMsg(slot: Long, payload: String): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      ProtoWire.writeVarintField(o, 1, slot)
      ProtoWire.writeStringField(o, 2, payload)
      o.toByteArray
    }
    val msgs = Seq(slotMsg(100, """{"kind":"slot"}"""), slotMsg(101, "x"))
    val reqBytes = GrpcH2.request("/geyser.Geyser/Subscribe", "node:10000", msgs)
    val req = GrpcH2.parse(reqBytes)
    assert(req.header(":method").contains("POST"))
    assert(req.header(":path").contains("/geyser.Geyser/Subscribe"))
    assert(req.header("content-type").contains("application/grpc"))
    assert(req.header("te").contains("trailers"))
    assert(req.messages.length == 2)
    val m0 = ProtoWire.decode(req.messages.head)
    assert(m0.varint(1).contains(100L))
    assert(m0.string(2).contains("""{"kind":"slot"}"""))
    // END_STREAM rides the LAST data frame (client half-close)
    val dataFrames = decodeConnection(reqBytes).filter(_.tpe == TData)
    assert(!dataFrames.head.has(FEndStream) && dataFrames.last.has(FEndStream))

    val respBytes = GrpcH2.response(Seq(slotMsg(102, "ok")), grpcStatus = 0,
      huffman = true)
    val resp = GrpcH2.parse(respBytes)
    assert(resp.header(":status").contains("200"))
    assert(resp.grpcStatus.contains(0))
    assert(ProtoWire.decode(resp.messages.head).varint(1).contains(102L))
    // the parsed messages feed the existing ingestion bridge unchanged
    val refr = new java.io.ByteArrayOutputStream()
    resp.messages.foreach(m => ProtoWire.writeFrame(refr, m))
    val updates = ProtoWire.readSlotUpdates(
      new java.io.ByteArrayInputStream(refr.toByteArray))
    assert(updates.flatten.toSeq == Seq((102L, "ok")))
  }

  test("empty-request half-close and non-zero grpc-status surface") {
    val req = GrpcH2.parse(GrpcH2.request("/svc/M", "h", Seq.empty))
    assert(req.messages.isEmpty)
    val resp = GrpcH2.parse(GrpcH2.response(Seq.empty, grpcStatus = 14))
    assert(resp.grpcStatus.contains(14)) // UNAVAILABLE
  }
}

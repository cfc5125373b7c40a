package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}

import org.scalatest.funsuite.AnyFunSuite

/** The hand-implemented protobuf + gRPC wire codec against the PUBLIC
  * specs' own golden byte vectors (protobuf.dev encoding guide; gRPC
  * PROTOCOL-HTTP2 length-prefixed framing), plus round-trip and
  * malformed-input behavior.
  */
class ProtoWireSpec extends AnyFunSuite {

  private def enc(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new ByteArrayOutputStream(); f(out); out.toByteArray
  }

  test("golden vector: varint 150 encodes as 96 01 (protobuf docs example)") {
    assert(enc(ProtoWire.writeVarint(_, 150L)).toSeq == Seq(0x96.toByte, 0x01.toByte))
    assert(ProtoWire.readVarint(new ByteArrayInputStream(
      Array(0x96.toByte, 0x01.toByte))) == 150L)
  }

  test("golden vector: field 1 = varint 150 is 08 96 01; field 2 = \"testing\" is 12 07 ...") {
    assert(enc(ProtoWire.writeVarintField(_, 1, 150L)).toSeq ==
      Seq(0x08, 0x96, 0x01).map(_.toByte))
    val s = enc(ProtoWire.writeStringField(_, 2, "testing"))
    assert(s.take(2).toSeq == Seq(0x12.toByte, 0x07.toByte))
    assert(new String(s.drop(2), "UTF-8") == "testing")
  }

  test("varint round-trips the full unsigned-64 range boundaries") {
    Seq(0L, 1L, 127L, 128L, 300L, Int.MaxValue.toLong, Long.MaxValue, -1L, Long.MinValue)
      .foreach { v =>
        assert(ProtoWire.readVarint(new ByteArrayInputStream(
          enc(ProtoWire.writeVarint(_, v)))) == v, s"varint $v")
      }
  }

  test("zigzag mapping matches the spec table") {
    assert(ProtoWire.zigzagEncode(0) == 0)
    assert(ProtoWire.zigzagEncode(-1) == 1)
    assert(ProtoWire.zigzagEncode(1) == 2)
    assert(ProtoWire.zigzagEncode(-2) == 3)
    Seq(0L, -1L, 1L, 12345L, -987654321L, Long.MaxValue, Long.MinValue).foreach(v =>
      assert(ProtoWire.zigzagDecode(ProtoWire.zigzagEncode(v)) == v))
  }

  test("message decode: last-occurrence scalar semantics, repeated access, unknown fields skipped") {
    val bytes = enc { out =>
      ProtoWire.writeVarintField(out, 1, 10L)
      ProtoWire.writeVarintField(out, 1, 20L) // proto3: last wins
      ProtoWire.writeStringField(out, 2, "hello")
      // unknown fixed64 field must be walked over, not crash
      ProtoWire.writeVarint(out, (99L << 3) | ProtoWire.WireFixed64)
      out.write(Array.fill[Byte](8)(0x7f))
      ProtoWire.writeStringField(out, 3, "tail survives the unknown field")
    }
    val m = ProtoWire.decode(bytes)
    assert(m.varint(1).contains(20L))
    assert(m.all(1).map(_.varint) == Seq(10L, 20L))
    assert(m.string(2).contains("hello"))
    assert(m.string(3).contains("tail survives the unknown field"))
    assert(m.varint(42).isEmpty)
  }

  test("nested messages decode through Message.message") {
    val inner = enc { out =>
      ProtoWire.writeVarintField(out, 1, 77L)
      ProtoWire.writeStringField(out, 2, "nested")
    }
    val outer = enc(ProtoWire.writeBytesField(_, 5, inner))
    val m = ProtoWire.decode(outer).message(5).get
    assert(m.varint(1).contains(77L) && m.string(2).contains("nested"))
  }

  test("malformed messages throw loudly: truncation and bad wire types") {
    intercept[EOFException](ProtoWire.decode(Array(0x08.toByte))) // tag then no varint
    intercept[EOFException](ProtoWire.decode(
      Array(0x12.toByte, 0x05.toByte, 'a'.toByte))) // len 5, 1 byte present
    intercept[IllegalArgumentException](ProtoWire.decode(
      Array(((1 << 3) | 3).toByte))) // wire type 3 (group) unsupported
  }

  test("gRPC framing: golden header, multi-frame streams, clean end between frames") {
    val payload = enc(ProtoWire.writeVarintField(_, 1, 150L))
    val framed = enc(ProtoWire.writeFrame(_, payload))
    assert(framed.take(5).toSeq ==
      Seq[Byte](0, 0, 0, 0, payload.length.toByte), "flag 0 + u32 BE length")
    val stream = enc { out =>
      ProtoWire.writeFrame(out, payload)
      ProtoWire.writeFrame(out, Array.emptyByteArray) // empty message frame
      ProtoWire.writeFrame(out, payload)
    }
    val got = ProtoWire.frames(new ByteArrayInputStream(stream)).toSeq
    assert(got.map(_.length) == Seq(payload.length, 0, payload.length))
    assert(got.head.toSeq == payload.toSeq)
  }

  test("gRPC framing: torn frames and compressed flags fail loudly") {
    val payload = enc(ProtoWire.writeVarintField(_, 1, 1L))
    val full = enc(ProtoWire.writeFrame(_, payload))
    intercept[EOFException]( // stream dies inside a frame body
      ProtoWire.frames(new ByteArrayInputStream(full.dropRight(1))).toSeq)
    intercept[EOFException]( // stream dies inside the header
      ProtoWire.frames(new ByteArrayInputStream(full.take(3))).toSeq)
    val compressed = full.clone(); compressed(0) = 1
    intercept[IllegalArgumentException](
      ProtoWire.frames(new ByteArrayInputStream(compressed)).toSeq)
  }

  test("slot-update bridge: framed protobuf stream -> (slot, payload) records with per-item skip") {
    val stream = enc { out =>
      ProtoWire.writeSlotUpdate(out, 1001L, """{"event_id": 1}""")
      // malformed message inside a VALID frame: per-item skip, not fatal
      ProtoWire.writeFrame(out, Array(0x08.toByte))
      // message missing the payload field: also a per-item skip
      ProtoWire.writeFrame(out, enc(ProtoWire.writeVarintField(_, 1, 1002L)))
      ProtoWire.writeSlotUpdate(out, 1003L, """{"event_id": 2}""")
    }
    val got = ProtoWire.readSlotUpdates(new ByteArrayInputStream(stream)).toSeq
    assert(got.flatten == Seq(1001L -> """{"event_id": 1}""", 1003L -> """{"event_id": 2}"""))
    assert(got.count(_.isEmpty) == 2, "both bad items skip individually")
  }

  test("full live path: gRPC frames -> slotlog -> parsed subscription -> exactly-once sink, across a relay restart") {
    // the complete intended Yellowstone shape, wire to table: a server
    // pushes framed protobuf slot updates; a relay appends payloads to
    // the slotlog; the engine's parsed subscription feeds the idempotent
    // sink. The relay dies mid-feed and a SECOND session re-sends an
    // overlapping window (at-least-once wire) — the table must hold each
    // event exactly once, with corrupt payloads skipped per-row.
    val tmp = java.nio.file.Files.createTempDirectory("grpc-e2e").toString
    val log = s"$tmp/feed.jsonl"
    def push(ids: Seq[Int], extra: Seq[String] = Nil): Unit = {
      val server = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
      val pusher = new Thread(() => {
        val sck = server.accept()
        val out = sck.getOutputStream
        ids.foreach { i =>
          ProtoWire.writeSlotUpdate(out, 2000L + i,
            s"""{"event_id": $i, "ts": ${1704067200000000L + i * 1000000L}, """ +
              s""""user_id": ${i % 3}, "event_type": "click", "value": 1.0, "props": "{}"}""")
        }
        extra.foreach(e => ProtoWire.writeSlotUpdate(out, 9999L, e))
        out.flush(); sck.close()
      })
      pusher.start()
      val sock = new java.net.Socket(java.net.InetAddress.getLoopbackAddress, server.getLocalPort)
      val w = new java.io.FileWriter(log, true)
      try
        ProtoWire.readSlotUpdates(sock.getInputStream).flatten.foreach { case (_, payload) =>
          w.write(payload + "\n")
        }
      finally { w.close(); sock.close(); server.close() }
      pusher.join()
    }
    push(1 to 12)
    push(9 to 18, extra = Seq("not json at all")) // overlap re-send + garbage

    val spark = graft.SparkSpec.session
    import spark.implicits._
    val table = s"$tmp/table"
    val q = graft.streaming.EventStreams.exactlyOnceSink(
      graft.streaming.EventStreams.subscribeSlotLog(spark, log).drop("slot"),
      table, s"$tmp/ckpt", "event_id")
    try {
      q.processAllAvailable()
      val ids = spark.read.parquet(table).select("event_id").as[Long].collect()
      assert(ids.length == 18 && ids.toSet == (1 to 18).map(_.toLong).toSet,
        s"wire overlap must collapse to exactly-once, garbage must skip: ${ids.sorted.toSeq}")
    } finally q.stop()
  }

  test("bridge to the engine's ingestion path: frames over a socket land in a slotlog, stream-readable") {
    // a stand-in Yellowstone session: server pushes gRPC-framed slot
    // updates over TCP; the client side relays (slot, payload) into the
    // append-only slotlog the engine already streams from
    val tmp = java.nio.file.Files.createTempDirectory("grpc-bridge").toString
    val log = s"$tmp/feed.jsonl"
    val server = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val pusher = new Thread(() => {
      val s = server.accept()
      val out = s.getOutputStream
      (1 to 25).foreach(i => ProtoWire.writeSlotUpdate(out, 1000L + i, s"""{"event_id": $i}"""))
      out.flush(); s.close()
    })
    pusher.start()
    val sock = new java.net.Socket(java.net.InetAddress.getLoopbackAddress, server.getLocalPort)
    val w = new java.io.FileWriter(log, true)
    try
      ProtoWire.readSlotUpdates(sock.getInputStream).flatten.foreach { case (_, payload) =>
        w.write(payload + "\n")
      }
    finally { w.close(); sock.close(); server.close() }
    pusher.join()

    val spark = graft.SparkSpec.session
    import spark.implicits._
    val q = spark.readStream.format("slotlog").option("path", log).load()
      .writeStream.format("memory").queryName("grpc_bridge")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val vals = spark.table("grpc_bridge").select("value").as[String].collect()
      assert(vals.length == 25)
      assert(vals.toSet == (1 to 25).map(i => s"""{"event_id": $i}""").toSet)
    } finally q.stop()
  }
}

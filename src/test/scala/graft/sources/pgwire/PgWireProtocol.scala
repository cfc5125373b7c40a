package graft.sources.pgwire

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

/** PostgreSQL v3 wire-protocol framing (public spec:
  * https://www.postgresql.org/docs/current/protocol-message-formats.html),
  * shared by the test-scope fake server and fake JDBC driver. Only the
  * message set `JdbcStore`'s Postgres leg exercises is implemented:
  * startup/auth, the simple query protocol ('Q'), and the extended
  * protocol ('P' Parse, 'B' Bind, 'E' Execute, 'S' Sync) with text-format
  * parameters — exactly what a batched `INSERT … ON CONFLICT DO NOTHING`
  * rides on.
  *
  * TEST SCOPE ONLY: this exists so the production `savePostgresUpsert`
  * branch (`jdbc:postgresql:` URLs) can execute against a real socket in
  * an environment with no Postgres binary and no pgjdbc jar. It must
  * never ship in the library jar — a fake driver claiming postgres URLs
  * would hijack real deployments.
  */
private[pgwire] object PgWireProtocol {

  val ProtocolV3 = 196608 // 3 << 16

  def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  /** One typed backend/frontend message: tag byte + int32 length(self+4) + body. */
  def writeMsg(out: DataOutputStream, tag: Byte, body: Array[Byte]): Unit = {
    out.writeByte(tag)
    out.writeInt(body.length + 4)
    out.write(body)
  }

  def writeCString(b: java.io.ByteArrayOutputStream, s: String): Unit = {
    b.write(utf8(s)); b.write(0)
  }

  /** Read one frontend/backend message after the startup phase. */
  def readMsg(in: DataInputStream): (Byte, Array[Byte]) = {
    val tag = in.readByte()
    val len = in.readInt()
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (tag, body)
  }

  final class BodyReader(body: Array[Byte]) {
    private var pos = 0
    def int32(): Int = {
      val v = ((body(pos) & 0xff) << 24) | ((body(pos + 1) & 0xff) << 16) |
        ((body(pos + 2) & 0xff) << 8) | (body(pos + 3) & 0xff)
      pos += 4; v
    }
    def int16(): Int = {
      val v = ((body(pos) & 0xff) << 8) | (body(pos + 1) & 0xff)
      pos += 2; v
    }
    def cstring(): String = {
      val start = pos
      while (body(pos) != 0) pos += 1
      val s = new String(body, start, pos - start, StandardCharsets.UTF_8)
      pos += 1; s
    }
    def bytes(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(body, pos, pos + n); pos += n; a
    }
    def remaining: Int = body.length - pos
  }
}

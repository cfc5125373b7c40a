package graft.sources.pgwire

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import PgWireProtocol._

/** A loopback fake Postgres: speaks the v3 wire protocol and implements
  * the SQL surface `JdbcStore`'s Postgres leg (and Spark's JDBC writer
  * beneath it) actually issues —
  *  - `CREATE TABLE t (…)`, `ALTER TABLE t ADD PRIMARY KEY (c)`
  *  - `SELECT 1 FROM t LIMIT 1` (Spark's existence probe)
  *  - `INSERT INTO t (…) VALUES (…) ON CONFLICT (k) DO NOTHING` via the
  *    extended protocol (Parse/Bind/Execute/Sync), honoring the conflict
  *    semantics against an in-memory keyed store and reporting the real
  *    per-statement `INSERT 0 0|1` tags batch drivers rely on
  *  - the two catalog probes the fake driver's DatabaseMetaData issues
  *    (information_schema-shaped table / unique-index listings)
  *  - `SELECT <cols> FROM t` whole-table reads.
  * Every Parse'd SQL text is recorded in [[parsedSql]] so specs can
  * golden-assert what actually crossed the wire.
  */
final class PgWireFakeServer {

  final case class Table(cols: Vector[String],
      rows: mutable.LinkedHashMap[String, Vector[Option[String]]],
      var uniqueKey: Option[String])

  /** table name (lower-cased) -> state; rows keyed by the unique-key value
    * once a key exists, by insertion index otherwise.
    */
  val tables = new TrieMap[String, Table]()
  val parsedSql = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  /** Every simple-protocol ('Q') SQL text, for spec forensics. */
  val simpleSql = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s), s"pgwire-conn-${s.getPort}")
        t.setDaemon(true); t.start()
      } catch { case _: Throwable => /* closed */ }
    }
  }, "pgwire-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }

  def tableRows(name: String): Seq[Vector[Option[String]]] =
    tables.get(name.toLowerCase).map(_.rows.values.toSeq).getOrElse(Nil)

  /** Pre-create a table (the "pre-existing production table" fixture). */
  def createTable(name: String, cols: Seq[String], uniqueKey: Option[String]): Unit =
    tables.put(name.toLowerCase,
      Table(cols.toVector, mutable.LinkedHashMap.empty, uniqueKey))

  // ——— per-connection protocol loop ———

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream))
    try {
      // startup: int32 len, int32 protocol, k\0v\0... \0   (no SSL probe —
      // the fake driver never sends one)
      val len = in.readInt()
      val proto = in.readInt()
      val rest = new Array[Byte](len - 8); in.readFully(rest)
      require(proto == ProtocolV3, s"unsupported protocol $proto")
      writeMsg(out, 'R', { val b = new ByteArrayOutputStream()
        b.write(Array[Byte](0, 0, 0, 0)); b.toByteArray }) // AuthenticationOk
      readyForQuery(out)
      out.flush()

      var prepared: String = null // the single unnamed prepared statement
      var lastBind = Vector.empty[Option[String]] // PER-CONNECTION portal state
      var pendingTags = Vector.empty[String]
      var open = true
      while (open) {
        val (tag, body) = readMsg(in)
        tag.toChar match {
          case 'Q' =>
            val sql = new BodyReader(body).cstring()
            simpleSql.add(sql)
            simpleQuery(out, sql)
            readyForQuery(out); out.flush()
          case 'P' => // Parse: name, sql, nParamTypes (+oids)
            val r = new BodyReader(body)
            r.cstring() // statement name (unnamed)
            prepared = r.cstring()
            parsedSql.add(prepared)
            writeMsg(out, '1', Array.emptyByteArray) // ParseComplete
          case 'B' => // Bind: portal, stmt, fmt codes, params (text)
            val r = new BodyReader(body)
            r.cstring(); r.cstring()
            val nFmt = r.int16(); (1 to nFmt).foreach(_ => r.int16())
            val nParams = r.int16()
            lastBind = (1 to nParams).map { _ =>
              val plen = r.int32()
              if (plen < 0) None
              else Some(new String(r.bytes(plen), StandardCharsets.UTF_8))
            }.toVector
            writeMsg(out, '2', Array.emptyByteArray) // BindComplete
          case 'E' => // Execute(portal, maxRows) — run the prepared stmt
            pendingTags :+= execPrepared(prepared, lastBind)
          case 'S' => // Sync: flush CommandComplete per pending Execute
            pendingTags.foreach { t =>
              writeMsg(out, 'C', { val b = new ByteArrayOutputStream()
                writeCString(b, t); b.toByteArray })
            }
            pendingTags = Vector.empty
            readyForQuery(out); out.flush()
          case 'X' => open = false
          case _ => // Describe/Flush/Close: ignore (driver doesn't send them)
        }
      }
    } catch {
      case _: java.io.EOFException => // client hung up
      case _: java.net.SocketException =>
    } finally sock.close()
  }

  private def readyForQuery(out: DataOutputStream): Unit =
    writeMsg(out, 'Z', Array[Byte]('I'))

  private def commandComplete(out: DataOutputStream, tag: String): Unit =
    writeMsg(out, 'C', { val b = new ByteArrayOutputStream()
      writeCString(b, tag); b.toByteArray })

  private def errorResponse(out: DataOutputStream, msg: String): Unit =
    writeMsg(out, 'E', { val b = new ByteArrayOutputStream()
      b.write('S'); writeCString(b, "ERROR")
      b.write('C'); writeCString(b, "42P01")
      b.write('M'); writeCString(b, msg)
      b.write(0); b.toByteArray })

  private def rowDescription(out: DataOutputStream, cols: Seq[String]): Unit =
    writeMsg(out, 'T', { val b = new ByteArrayOutputStream()
      b.write((cols.length >> 8) & 0xff); b.write(cols.length & 0xff)
      cols.foreach { c =>
        writeCString(b, c)
        // tableOid(4) attnum(2) typoid(4)=25 text, typlen(2)=-1,
        // typmod(4)=-1, fmt(2)=0
        b.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 25))
        b.write(Array[Byte](-1, -1, -1, -1, -1, -1, 0, 0))
      }
      b.toByteArray })

  private def dataRow(out: DataOutputStream, vals: Seq[Option[String]]): Unit =
    writeMsg(out, 'D', { val b = new ByteArrayOutputStream()
      b.write((vals.length >> 8) & 0xff); b.write(vals.length & 0xff)
      vals.foreach {
        case None => b.write(Array[Byte](-1, -1, -1, -1))
        case Some(v) =>
          val u = utf8(v)
          b.write((u.length >> 24) & 0xff); b.write((u.length >> 16) & 0xff)
          b.write((u.length >> 8) & 0xff); b.write(u.length & 0xff)
          b.write(u)
      }
      b.toByteArray })

  // ——— SQL handling ———

  private val CreateRe =
    """(?is)\s*CREATE\s+TABLE\s+"?([\w.]+)"?\s*\((.*)\)\s*""".r
  private val AlterPkRe =
    """(?is)\s*ALTER\s+TABLE\s+"?([\w.]+)"?\s+ADD\s+PRIMARY\s+KEY\s*\(\s*"?(\w+)"?\s*\)\s*""".r
  private val Probe1Re =
    """(?is)\s*SELECT\s+1\s+FROM\s+"?([\w.]+)"?\s+LIMIT\s+1\s*""".r
  private val MetaTablesRe =
    """(?is)\s*SELECT\s+table_name\s+FROM\s+information_schema\.tables\s+WHERE\s+lower\(table_name\)\s*=\s*'(\w+)'\s*""".r
  private val MetaIndexRe =
    """(?is)\s*SELECT\s+i\.relname\s+AS\s+index_name\s*,\s*a\.attname\s+AS\s+column_name\s+FROM\s+pg_class\s.*lower\(t\.relname\)\s*=\s*'(\w+)'\s*""".r
  private val InsertRe =
    """(?is)\s*INSERT\s+INTO\s+"?([\w.]+)"?\s*\(([^)]*)\)\s*VALUES\s*\(([^)]*)\)\s*(ON\s+CONFLICT\s*\(\s*"?(\w+)"?\s*\)\s*DO\s+NOTHING)?\s*""".r
  private val SelectAllRe =
    """(?is)\s*SELECT\s+([\w\s,"*]+)\s+FROM\s+"?([\w.]+)"?\s*""".r
  // Spark's JDBC schema probe: SELECT * FROM t WHERE 1=0 — rows never flow,
  // only the RowDescription does
  private val SchemaProbeRe =
    """(?is)\s*SELECT\s+(.*)\s+FROM\s+"?([\w.]+)"?\s+WHERE\s+1\s*=\s*0\s*""".r

  private def simpleQuery(out: DataOutputStream, sql: String): Unit = sql match {
    case CreateRe(name, colsBody) =>
      // split on top-level commas; each entry is `colname TYPE...`
      val cols = colsBody.split(",").map(_.trim.split("\\s+")(0)
        .stripPrefix("\"").stripSuffix("\"")).toVector
      tables.put(name.toLowerCase,
        Table(cols, mutable.LinkedHashMap.empty, None))
      commandComplete(out, "CREATE TABLE")
    case AlterPkRe(name, key) =>
      tables.get(name.toLowerCase) match {
        case Some(t) => t.uniqueKey = Some(key.toLowerCase)
          commandComplete(out, "ALTER TABLE")
        case None => errorResponse(out, s"relation $name does not exist")
      }
    case Probe1Re(name) =>
      tables.get(name.toLowerCase) match {
        case Some(t) =>
          rowDescription(out, Seq("?column?"))
          if (t.rows.nonEmpty) dataRow(out, Seq(Some("1")))
          commandComplete(out, s"SELECT ${math.min(1, t.rows.size)}")
        case None => errorResponse(out, s"relation $name does not exist")
      }
    case MetaTablesRe(name) =>
      rowDescription(out, Seq("table_name"))
      if (tables.contains(name.toLowerCase)) dataRow(out, Seq(Some(name)))
      commandComplete(out, "SELECT")
    case MetaIndexRe(name) =>
      rowDescription(out, Seq("index_name", "column_name"))
      tables.get(name.toLowerCase).flatMap(_.uniqueKey).foreach { k =>
        dataRow(out, Seq(Some(s"${name}_pkey"), Some(k)))
      }
      commandComplete(out, "SELECT")
    case SchemaProbeRe(_, name) =>
      tables.get(name.toLowerCase) match {
        case Some(t) =>
          rowDescription(out, t.cols)
          commandComplete(out, "SELECT 0")
        case None => errorResponse(out, s"relation $name does not exist")
      }
    case SelectAllRe(colsBody, name) if tables.contains(name.toLowerCase) =>
      val t = tables(name.toLowerCase)
      val want =
        if (colsBody.trim == "*") t.cols
        else colsBody.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toVector
      val idx = want.map(c => t.cols.indexWhere(_.equalsIgnoreCase(c)))
      rowDescription(out, want)
      val snap = t.synchronized(t.rows.values.toVector)
      snap.foreach(r => dataRow(out, idx.map(i => if (i >= 0) r(i) else None)))
      commandComplete(out, s"SELECT ${snap.size}")
    case s if s.matches("(?is)\\s*(BEGIN|COMMIT|ROLLBACK)\\s*") =>
      commandComplete(out, s.trim.toUpperCase.split("\\s+")(0))
    case s if InsertRe.pattern.matcher(s).matches() =>
      // a literal (param-free) insert over the simple protocol
      commandComplete(out, execPrepared(s, Vector.empty))
    case _ =>
      // anything else (SET …, driver probes): succeed silently — the
      // surface under test is the DML above
      commandComplete(out, "OK")
  }

  /** Apply a (possibly ON CONFLICT) INSERT with bound text params. */
  private def execPrepared(sql: String, params: Vector[Option[String]]): String =
    sql match {
      case InsertRe(name, colsBody, valuesBody, conflictClause, conflictKey) =>
        val t = tables.getOrElseUpdate(name.toLowerCase, Table(
          colsBody.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toVector,
          mutable.LinkedHashMap.empty, None))
        val cols = colsBody.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toVector
        // values are $1…$n or ? placeholders in order
        val row = t.cols.map { c =>
          val i = cols.indexWhere(_.equalsIgnoreCase(c))
          if (i >= 0 && i < params.length) params(i) else None
        }
        // serialize per-table: concurrent executor partitions each hold
        // their own connection (exactly the production shape), and a real
        // Postgres arbitrates ON CONFLICT atomically per statement
        t.synchronized {
          if (conflictClause != null) {
            val key = conflictKey.toLowerCase
            require(t.uniqueKey.contains(key),
              s"ON CONFLICT ($key) without a matching unique constraint on $name " +
                "— a real Postgres errors here (42P10)")
            val ki = cols.indexWhere(_.equalsIgnoreCase(key))
            val kv = params(ki).getOrElse("NULL")
            if (t.rows.contains(kv)) "INSERT 0 0"
            else { t.rows.put(kv, row); "INSERT 0 1" }
          } else {
            t.rows.put(s"_row${t.rows.size}_${System.nanoTime()}", row)
            "INSERT 0 1"
          }
        }
      case _ => "OK"
    }
}

package graft.sources.pgwire

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.net.Socket
import java.sql.{Connection, DatabaseMetaData, Driver, PreparedStatement, ResultSet, SQLException, Statement}
import java.util.Properties
import scala.collection.mutable

import PgWireProtocol._

/** The frontend half of the v3 wire: startup handshake, simple queries,
  * and batched extended-protocol execution with text parameters.
  */
private[pgwire] final class PgWireClient(host: String, port: Int,
    user: String, database: String) {
  private val sock = new Socket(host, port)
  private val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
  private val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream))

  locally { // startup + wait for ReadyForQuery
    val b = new ByteArrayOutputStream()
    writeCString(b, "user"); writeCString(b, user)
    writeCString(b, "database"); writeCString(b, database)
    b.write(0)
    val body = b.toByteArray
    out.writeInt(body.length + 8)
    out.writeInt(ProtocolV3)
    out.write(body)
    out.flush()
    drainUntilReady()
  }

  final case class Result(cols: Vector[String],
      rows: Vector[Vector[Option[String]]], tags: Vector[String])

  private def drainUntilReady(): Result = {
    var cols = Vector.empty[String]
    val rows = mutable.Buffer[Vector[Option[String]]]()
    val tags = mutable.Buffer[String]()
    var err: String = null
    var errState: String = null
    var done = false
    while (!done) {
      val (tag, body) = readMsg(in)
      tag.toChar match {
        case 'Z' => done = true
        case 'R' | '1' | '2' | 'S' | 'K' | 'N' => // auth ok / parse / bind / params
        case 'T' =>
          val r = new BodyReader(body)
          val n = r.int16()
          cols = (1 to n).map { _ =>
            val name = r.cstring()
            r.bytes(18) // oids/typlen/typmod/fmt
            name
          }.toVector
        case 'D' =>
          val r = new BodyReader(body)
          val n = r.int16()
          rows += (1 to n).map { _ =>
            val len = r.int32()
            if (len < 0) None
            else Some(new String(r.bytes(len), java.nio.charset.StandardCharsets.UTF_8))
          }.toVector
        case 'C' => tags += new BodyReader(body).cstring()
        case 'E' =>
          // typed fields: S severity, C sqlstate, M message (and others) —
          // the SQLSTATE must ride into the SQLException, because callers
          // (Spark's dialect classifiers) branch on it (e.g. 42P01 =
          // undefined table → "doesn't exist", anything else → rethrow)
          val r = new BodyReader(body)
          val sb = new StringBuilder
          var f = r.bytes(1)(0)
          while (f != 0) {
            val v = r.cstring()
            if (f == 'C') errState = v
            sb.append(f.toChar).append('=').append(v).append(' ')
            f = r.bytes(1)(0)
          }
          err = sb.toString
        case _ => // ignore
      }
    }
    if (err != null) throw new SQLException(s"pgwire error: $err", errState)
    Result(cols, rows.toVector, tags.toVector)
  }

  def simpleQuery(sql: String): Result = synchronized {
    writeMsg(out, 'Q', { val b = new ByteArrayOutputStream()
      writeCString(b, sql); b.toByteArray })
    out.flush()
    drainUntilReady()
  }

  /** Parse once, Bind+Execute per param vector, one Sync — the shape a
    * real batching driver puts `executeBatch` on the wire in. Returns the
    * per-statement inserted counts from the `INSERT 0 n` tags.
    */
  def executeBatch(sql: String, batches: Seq[Vector[Option[String]]]): Array[Int] =
    synchronized {
      writeMsg(out, 'P', { val b = new ByteArrayOutputStream()
        writeCString(b, ""); writeCString(b, sql)
        b.write(0); b.write(0) // no param-type oids
        b.toByteArray })
      batches.foreach { params =>
        writeMsg(out, 'B', { val b = new ByteArrayOutputStream()
          writeCString(b, ""); writeCString(b, "")
          b.write(0); b.write(0) // all-default (text) param formats
          b.write((params.length >> 8) & 0xff); b.write(params.length & 0xff)
          params.foreach {
            case None => b.write(Array[Byte](-1, -1, -1, -1))
            case Some(v) =>
              val u = utf8(v)
              b.write((u.length >> 24) & 0xff); b.write((u.length >> 16) & 0xff)
              b.write((u.length >> 8) & 0xff); b.write(u.length & 0xff)
              b.write(u)
          }
          b.write(0); b.write(0) // no result-format codes
          b.toByteArray })
        writeMsg(out, 'E', { val b = new ByteArrayOutputStream()
          writeCString(b, ""); b.write(Array[Byte](0, 0, 0, 0))
          b.toByteArray })
      }
      writeMsg(out, 'S', Array.emptyByteArray)
      out.flush()
      val res = drainUntilReady()
      res.tags.map { t =>
        val parts = t.split(" ")
        if (parts.length == 3 && parts(0) == "INSERT") parts(2).toInt else 0
      }.toArray
    }

  def close(): Unit = synchronized {
    try { writeMsg(out, 'X', Array.emptyByteArray); out.flush() }
    catch { case _: Throwable => }
    sock.close()
  }
}

/** TEST-SCOPE `java.sql.Driver` for `jdbc:postgresql:` URLs, backed by
  * [[PgWireClient]] against the [[PgWireFakeServer]]. Implements exactly
  * the JDBC surface `JdbcStore`'s Postgres leg and Spark's JDBC writer
  * touch, via reflection proxies (an unimplemented method fails loudly
  * with its own name, so coverage gaps surface in the spec run instead
  * of hiding).
  */
final class FakePgDriver extends Driver {
  import FakePgDriver._

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql:")

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null
    val m = """jdbc:postgresql://([^:/]+):(\d+)/(\w+)""".r.findFirstMatchIn(url)
      .getOrElse(throw new SQLException(s"bad url $url"))
    val client = new PgWireClient(m.group(1), m.group(2).toInt,
      Option(info.getProperty("user")).getOrElse("graft"), m.group(3))
    connection(client)
  }

  override def getMajorVersion: Int = 42
  override def getMinorVersion: Int = 0
  override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
  override def getPropertyInfo(url: String, info: Properties):
      Array[java.sql.DriverPropertyInfo] = Array.empty
  override def jdbcCompliant(): Boolean = false
}

object FakePgDriver {
  // self-register exactly like a real JDBC driver's static initializer —
  // production code's `Class.forName(driver)` is enough to route URLs here
  java.sql.DriverManager.registerDriver(new FakePgDriver)
  def register(): Unit = () // touching the object forces the init above

  private def proxy[T](iface: Class[T])(
      handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          handle.applyOrElse((m.getName, a), { (k: (String, Array[AnyRef])) =>
            k._1 match {
              case "toString" => s"FakePg(${iface.getSimpleName})"
              case "hashCode" => Int.box(System.identityHashCode(p))
              case "equals"   => Boolean.box(p eq a(0))
              case "isWrapperFor" => Boolean.box(false)
              case other => throw new SQLException(
                s"FakePgDriver: unimplemented ${iface.getSimpleName}.$other")
            }
          })
        }
      }).asInstanceOf[T]

  private val NULLV: AnyRef = null

  private def connection(client: PgWireClient): Connection = {
    var autoCommit = true
    var closed = false
    proxy(classOf[Connection]) {
      case ("prepareStatement", Array(sql: String)) => prepared(client, sql)
      case ("prepareStatement", Array(sql: String, _, _)) => prepared(client, sql)
      case ("createStatement", _) => statement(client)
      case ("getMetaData", _) => metaData(client)
      case ("setAutoCommit", Array(b: java.lang.Boolean)) =>
        autoCommit = b.booleanValue(); NULLV
      case ("getAutoCommit", _) => Boolean.box(autoCommit)
      case ("commit", _) => client.simpleQuery("COMMIT"); NULLV
      case ("rollback", _) => client.simpleQuery("ROLLBACK"); NULLV
      case ("close", _) => if (!closed) { closed = true; client.close() }; NULLV
      case ("isClosed", _) => Boolean.box(closed)
      case ("setTransactionIsolation", _) => NULLV
      case ("getTransactionIsolation", _) =>
        Int.box(Connection.TRANSACTION_READ_COMMITTED)
      case ("isValid", _) => Boolean.box(!closed)
      case ("clearWarnings", _) | ("setNetworkTimeout", _) => NULLV
      case ("getNetworkTimeout", _) => Int.box(0)
      case ("getCatalog", _) | ("getSchema", _) | ("getWarnings", _) => NULLV
    }
  }

  private def statement(client: PgWireClient): Statement =
    proxy(classOf[Statement]) {
      case ("executeUpdate", Array(sql: String)) =>
        client.simpleQuery(sql); Int.box(0)
      case ("execute", Array(sql: String)) =>
        client.simpleQuery(sql); Boolean.box(false)
      case ("executeQuery", Array(sql: String)) =>
        resultSet(client.simpleQuery(sql))
      case ("setQueryTimeout", _) | ("close", _) | ("cancel", _) |
           ("clearWarnings", _) | ("setFetchSize", _) => NULLV
      case ("getWarnings", _) => NULLV
    }

  private def prepared(client: PgWireClient, sql: String): PreparedStatement = {
    val nParams = sql.count(_ == '?')
    // '?' placeholders → $1…$n (the v3 extended protocol's binding syntax)
    val dollarSql = {
      var i = 0
      sql.flatMap { c => if (c == '?') { i += 1; s"$$$i" } else c.toString }
    }
    val current = new Array[Option[String]](nParams)
    java.util.Arrays.fill(current.asInstanceOf[Array[AnyRef]], None)
    val batches = mutable.Buffer[Vector[Option[String]]]()
    proxy(classOf[PreparedStatement]) {
      case ("setObject", Array(i: Integer, v)) =>
        current(i - 1) = Option(v).map(String.valueOf(_)); NULLV
      case ("setNull", Array(i: Integer, _*)) => current(i - 1) = None; NULLV
      case ("setString", Array(i: Integer, v)) =>
        current(i - 1) = Option(v).map(String.valueOf(_)); NULLV
      case ("setLong", Array(i: Integer, v)) =>
        current(i - 1) = Some(String.valueOf(v)); NULLV
      case ("setInt", Array(i: Integer, v)) =>
        current(i - 1) = Some(String.valueOf(v)); NULLV
      case ("setDouble", Array(i: Integer, v)) =>
        current(i - 1) = Some(String.valueOf(v)); NULLV
      case ("setBoolean", Array(i: Integer, v)) =>
        current(i - 1) = Some(String.valueOf(v)); NULLV
      case ("addBatch", _) => batches += current.toVector; NULLV
      case ("executeBatch", _) =>
        val r = client.executeBatch(dollarSql, batches.toSeq)
        batches.clear(); r
      case ("clearBatch", _) => batches.clear(); NULLV
      case ("executeUpdate", _) =>
        val r = client.executeBatch(dollarSql, Seq(current.toVector))
        Int.box(r.headOption.getOrElse(0))
      case ("executeQuery", _) => resultSet(client.simpleQuery(dollarSql))
      case ("setQueryTimeout", _) | ("close", _) | ("clearWarnings", _) |
           ("setFetchSize", _) | ("cancel", _) => NULLV
      case ("getWarnings", _) => NULLV
    }
  }

  /** Metadata via catalog-shaped queries over the same wire (the fake
    * server implements the two probe shapes) — so even metadata traffic
    * is real protocol traffic, not a local shortcut.
    */
  private def metaData(client: PgWireClient): DatabaseMetaData =
    proxy(classOf[DatabaseMetaData]) {
      case ("getTables", Array(_, _, name: String, _)) =>
        resultSet(client.simpleQuery(
          "SELECT table_name FROM information_schema.tables WHERE " +
            s"lower(table_name) = '${name.toLowerCase}'"))
      case ("getIndexInfo", Array(_, _, name: String, _, _)) =>
        // the REAL pg_catalog unique-index probe (what pgjdbc's
        // getIndexInfo boils down to), so this driver works unchanged
        // against a genuine Postgres server (RealPostgresSpec); the fake
        // server recognizes the same shape
        resultSet(client.simpleQuery(
          "SELECT i.relname AS index_name, a.attname AS column_name " +
            "FROM pg_class t JOIN pg_index ix ON t.oid = ix.indrelid " +
            "JOIN pg_class i ON i.oid = ix.indexrelid " +
            "JOIN pg_attribute a ON a.attrelid = t.oid AND a.attnum = ANY(ix.indkey) " +
            s"WHERE ix.indisunique AND lower(t.relname) = '${name.toLowerCase}'"))
      case ("getDatabaseMajorVersion", _) => Int.box(16)
      case ("getDatabaseMinorVersion", _) => Int.box(0)
      case ("getDatabaseProductName", _) => "PostgreSQL"
      case ("getDatabaseProductVersion", _) => "16.0 (graft fake)"
      case ("getDriverName", _) => "graft-fake-pg"
      case ("getDriverVersion", _) => "0.1"
      case ("getDriverMajorVersion", _) => Int.box(0)
      case ("getDriverMinorVersion", _) => Int.box(1)
      case ("getDefaultTransactionIsolation", _) =>
        Int.box(java.sql.Connection.TRANSACTION_READ_COMMITTED)
      case ("supportsTransactions", _) => Boolean.box(true)
      case ("supportsDataManipulationTransactionsOnly", _) => Boolean.box(false)
      case ("supportsTransactionIsolationLevel", _) => Boolean.box(true)
      case ("getJDBCMajorVersion", _) => Int.box(4)
      case ("getJDBCMinorVersion", _) => Int.box(2)
      case ("storesLowerCaseIdentifiers", _) => Boolean.box(true)
      case ("storesUpperCaseIdentifiers", _) => Boolean.box(false)
      case ("getIdentifierQuoteString", _) => "\""
      case ("getSQLKeywords", _) => ""
    }

  private def resultSet(res: PgWireClient#Result): ResultSet = {
    var cursor = -1
    var lastNull = false
    def col(label: String): Int = {
      val i = res.cols.indexWhere(_.equalsIgnoreCase(label))
      if (i < 0) throw new SQLException(s"no column $label in ${res.cols}")
      i
    }
    def value(i: Int): Option[String] = {
      val v = res.rows(cursor)(i); lastNull = v.isEmpty; v
    }
    proxy(classOf[ResultSet]) {
      case ("next", _) =>
        cursor += 1; Boolean.box(cursor < res.rows.length)
      case ("getString", Array(label: String)) => value(col(label)).orNull
      case ("getString", Array(i: Integer)) => value(i - 1).orNull
      case ("getInt", Array(label: String)) =>
        Int.box(value(col(label)).map(_.toInt).getOrElse(0))
      case ("getInt", Array(i: Integer)) =>
        Int.box(value(i - 1).map(_.toInt).getOrElse(0))
      case ("getLong", Array(label: String)) =>
        Long.box(value(col(label)).map(_.toLong).getOrElse(0L))
      case ("getLong", Array(i: Integer)) =>
        Long.box(value(i - 1).map(_.toLong).getOrElse(0L))
      case ("wasNull", _) => Boolean.box(lastNull)
      case ("close", _) => NULLV
      case ("getMetaData", _) =>
        // every column reads as nullable text — the fake stores text-format
        // values, and Spark's getCatalystType maps VARCHAR → StringType
        proxy(classOf[java.sql.ResultSetMetaData]) {
          case ("getColumnCount", _) => Int.box(res.cols.length)
          case ("getColumnLabel", Array(i: Integer)) => res.cols(i - 1)
          case ("getColumnName", Array(i: Integer)) => res.cols(i - 1)
          case ("getColumnType", _) => Int.box(java.sql.Types.VARCHAR)
          case ("getColumnTypeName", _) => "text"
          case ("getPrecision", _) | ("getScale", _) |
               ("getColumnDisplaySize", _) => Int.box(0)
          case ("isSigned", _) | ("isCaseSensitive", _) |
               ("isCurrency", _) | ("isAutoIncrement", _) => Boolean.box(false)
          case ("isNullable", _) =>
            Int.box(java.sql.ResultSetMetaData.columnNullable)
        }
    }
  }
}

package graft.sources

import graft.SparkSpec
import graft.sources.pgwire.{FakePgDriver, PgWireFakeServer}

/** Round-15 closure of the r14 "untested PG-dialect SQL" gap: the
  * production `JdbcStore.saveIdempotent` Postgres branch
  * (`savePostgresUpsert` — per-partition `executeBatch` of
  * `INSERT … ON CONFLICT (key) DO NOTHING`, the reference's exact
  * statement at `adapters/src/repo.rs:26,56`) executed against a REAL
  * socket speaking the v3 wire protocol. The backend is a protocol-level
  * fake (`pgwire.PgWireFakeServer`) that implements the conflict
  * semantics server-side and records every Parse'd SQL text — there is
  * no Postgres binary and no pgjdbc jar in this environment, so the
  * fake driver + fake server pair is what makes the branch EXECUTABLE
  * rather than string-asserted (the r14 state). The Derby leg
  * (JdbcStoreDialectSpec) still covers the dialect-neutral anti-join.
  */
class PgWireUpsertSpec extends SparkSpec {

  import spark.implicits._

  private def withServer(f: (PgWireFakeServer, String, Map[String, String]) => Unit): Unit = {
    FakePgDriver.register()
    val srv = new PgWireFakeServer
    try f(srv, s"jdbc:postgresql://127.0.0.1:${srv.port}/graftdb",
      Map("driver" -> "graft.sources.pgwire.FakePgDriver", "user" -> "graft"))
    finally srv.close()
  }

  test("PG branch: batched ON CONFLICT upsert into a pre-existing keyed table is idempotent over the wire") {
    withServer { (srv, url, opts) =>
      // the production deployment shape: the table pre-exists with its
      // PRIMARY KEY (the reference's init.sql), data flows in later
      srv.createTable("txns", Seq("id", "wallet_address", "amount"), Some("id"))
      val batch = Seq(
        ("a", "w1", 10L), ("b", "w1", 20L), ("c", "w2", 30L),
        ("a", "w1", 10L) // in-batch duplicate: dropDuplicates eats it
      ).toDF("id", "wallet_address", "amount")
      val n1 = JdbcStore.saveIdempotent(spark, batch, url, "txns", "id", opts)
      assert(n1 == 3, s"first save must insert 3, got $n1")
      assert(srv.tableRows("txns").size == 3)
      // REPLAY the same batch: the database arbitrates — zero inserted
      val n2 = JdbcStore.saveIdempotent(spark, batch, url, "txns", "id", opts)
      assert(n2 == 0, s"replay must insert 0, got $n2")
      assert(srv.tableRows("txns").size == 3)
      // overlapping second batch: only the new key lands
      val batch2 = Seq(("b", "w9", 99L), ("d", "w3", 40L))
        .toDF("id", "wallet_address", "amount")
      val n3 = JdbcStore.saveIdempotent(spark, batch2, url, "txns", "id", opts)
      assert(n3 == 1, s"overlap batch must insert 1, got $n3")
      val rows = srv.tableRows("txns")
      assert(rows.size == 4)
      // the conflicting 'b' kept its ORIGINAL payload (DO NOTHING, not update)
      assert(rows.exists(r => r(0).contains("b") && r(2).contains("20")))
      // golden: the reference's statement shape actually crossed the wire
      val wire = srv.parsedSql.toArray.map(_.toString)
      assert(wire.exists(s => s.contains("INSERT INTO txns") &&
        s.contains("ON CONFLICT (id) DO NOTHING")),
        s"upsert SQL must ride the wire, saw: ${wire.mkString("; ")}")
    }
  }

  test("PG branch: fresh table gets created + keyed through Spark's JDBC writer, then upserted") {
    withServer { (srv, url, opts) =>
      val batch = Seq(("x", 1L), ("y", 2L)).toDF("id", "v")
      val n = try JdbcStore.saveIdempotent(spark, batch, url, "fresh_t", "id", opts)
        catch { case e: Throwable =>
          fail(s"fresh-table save failed: $e\nsimple SQL seen by server:\n  " +
            srv.simpleSql.toArray.mkString("\n  "), e)
        }
      assert(n == 2, s"fresh table save must insert 2, got $n")
      // the table was created over the wire with the PRIMARY KEY DDL the
      // native statement requires
      assert(srv.tables("fresh_t").uniqueKey.contains("id"))
      assert(srv.tableRows("fresh_t").size == 2)
      // replay: no-op
      assert(JdbcStore.saveIdempotent(spark, batch, url, "fresh_t", "id", opts) == 0)
    }
  }

  test("PG branch: a pre-existing table WITHOUT a unique key falls back to the anti-join path") {
    withServer { (srv, url, opts) =>
      srv.createTable("nokey", Seq("id", "v"), uniqueKey = None)
      // the native statement would fail server-side (42P10); the dispatch
      // must detect the missing constraint and take the anti-join merge,
      // which reads existing keys over JDBC. The fake server serves that
      // read through the simple-protocol SELECT.
      val batch = Seq(("k1", 1L), ("k2", 2L)).toDF("id", "v")
      val n = JdbcStore.saveIdempotent(spark, batch, url, "nokey", "id", opts)
      assert(n == 2)
      assert(srv.tableRows("nokey").size == 2)
    }
  }
}

package graft

import graft.analytics.LedgerQueries
import graft.sources.{JdbcStore, JsonlBronzeSink}
import java.nio.file.Files

/** The CLI surface mirrors the reference's subcommands end to end
  * (`cli/src/main.rs`): file-mode ingest→normalize, and the DB-first
  * strategy over init-db'd tables, including `db:<wallet>` input.
  */
class CliSpec extends SparkSpec {

  test("file mode: ingest writes bronze JSONL, normalize writes silver JSONL") {
    val tmp = Files.createTempDirectory("cli").toString
    JsonlBronzeSink.write(LedgerQueries.fixtureBronze(spark), s"$tmp/in")
    Cli.run(spark, Seq("ingest",
      "--wallet", LedgerQueries.W, "--source", s"$tmp/in",
      "--limit", "100", "--output", s"$tmp/bronze"))
    Cli.run(spark, Seq("normalize",
      "--input", s"$tmp/bronze", "--output", s"$tmp/silver"))
    val silver = spark.read.json(s"$tmp/silver")
    val entries = silver.select("transaction_id", "asset_symbol", "amount")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .sortBy(e => (e._1, e._2)).toSeq
    assert(entries == Seq(
      ("tx1", "SOL", -0.5), ("tx2", "MintA", 2.5),
      ("tx2", "MintB", 3.0), ("tx5", "MintD", 4.0)))
  }

  test("db mode: init-db creates empty tables; ingest/normalize use the DB-first strategy") {
    val tmp = Files.createTempDirectory("clidb").toString
    val url = s"jdbc:derby:$tmp/db;create=true"
    val driver = Seq("--driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    JsonlBronzeSink.write(LedgerQueries.fixtureBronze(spark), s"$tmp/in")

    Cli.run(spark, Seq("init-db", "--db", url) ++ driver)
    assert(JdbcStore.read(spark, url, "transactions", opts).count() == 0)
    assert(JdbcStore.read(spark, url, "ledger_entries", opts).count() == 0)

    Cli.run(spark, Seq("ingest", "--wallet", LedgerQueries.W,
      "--source", s"$tmp/in", "--limit", "100", "--db", url) ++ driver)
    assert(JdbcStore.read(spark, url, "transactions", opts).count() == 5)

    Cli.run(spark, Seq("normalize", "--input", s"db:${LedgerQueries.W}",
      "--db", url) ++ driver)
    val entries = JdbcStore.read(spark, url, "ledger_entries", opts)
      .select("transaction_id", "asset_symbol", "amount")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .sortBy(e => (e._1, e._2)).toSeq
    assert(entries == Seq(
      ("tx1", "SOL", -0.5), ("tx2", "MintA", 2.5),
      ("tx2", "MintB", 3.0), ("tx5", "MintD", 4.0)))

    // replay: idempotent end to end, like the reference's ON CONFLICT
    Cli.run(spark, Seq("ingest", "--wallet", LedgerQueries.W,
      "--source", s"$tmp/in", "--limit", "100", "--db", url) ++ driver)
    Cli.run(spark, Seq("normalize", "--input", s"db:${LedgerQueries.W}",
      "--db", url) ++ driver)
    assert(JdbcStore.read(spark, url, "transactions", opts).count() == 5)
    assert(JdbcStore.read(spark, url, "ledger_entries", opts).count() == 4)

    // re-running init-db (= migrate) against the migrated DB is a no-op
    assert(graft.sources.Migrations.migrate(spark, url, opts).isEmpty)
  }

  test("migrations: staged apply, recorded history, replayable wallet backfill, drift detection") {
    import graft.sources.Migrations
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("mig").toString
    val url = s"jdbc:derby:$tmp/db;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

    // stage 1: apply ONLY init — silver exists in its pre-wallet shape
    assert(Migrations.migrate(spark, url, opts, upTo = Some(20251219000000L))
      == Seq(20251219000000L))
    assert(!JdbcStore.read(spark, url, "ledger_entries", opts)
      .columns.contains("wallet_address"))

    // populate the pre-migration database: bronze rows + wallet-LESS
    // silver rows (the state a deployed reference DB was in before
    // 20251219010000 shipped)
    val bronze = LedgerQueries.fixtureBronze(spark)
    JdbcStore.saveIdempotent(spark, bronze, url, "transactions", "id", opts)
    val entries = graft.normalize.ChainNormalizers.normalizeAll(bronze)
    JdbcStore.saveIdempotent(spark, entries.drop("wallet_address"),
      url, "ledger_entries", "id", opts)

    // stage 2: the recorded step is skipped, the backfill step applies
    assert(Migrations.migrate(spark, url, opts) == Seq(20251219010000L))
    val migrated = JdbcStore.read(spark, url, "ledger_entries", opts)
      .select("transaction_id", "wallet_address")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = entries.select("transaction_id", "wallet_address")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(migrated == expected, "backfill must equal the normalizer's wallet column")
    assert(migrated.forall(_._2 == LedgerQueries.W))

    // idempotent + fully recorded
    assert(Migrations.migrate(spark, url, opts).isEmpty)
    val log = JdbcStore.read(spark, url, Migrations.LogTable, opts)
      .select("version").collect().map(_.getLong(0)).toSet
    assert(log == Set(20251219000000L, 20251219010000L))

    // appends against the migrated schema keep working (NOT NULL wallet)
    assert(JdbcStore.saveIdempotent(spark, entries, url,
      "ledger_entries", "id", opts) == 0) // same ids: replay no-op

    // drift: a recorded version whose registered description changed (or
    // vanished) fails loudly — the sqlx altered-migration contract
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"UPDATE ${Migrations.LogTable} SET description = 'tampered' " +
          "WHERE version = 20251219000000")
      finally st.close()
    } finally conn.close()
    val err = intercept[RuntimeException](Migrations.migrate(spark, url, opts))
    assert(err.getMessage.contains("drifted"))
  }
  test("live mode: ingest --source http --poll runs the exactly-once poll loop") {
    val node = new RpcStubNode(total = 4)
    val tmp = Files.createTempDirectory("clipoll").toString
    try {
      Cli.run(spark, Seq("ingest", "--wallet", "Wp",
        "--source", node.endpoint, "--poll", "2",
        "--poll-interval-ms", "0", "--limit", "100",
        "--output", s"$tmp/bronze"))
      assert(spark.read.parquet(s"$tmp/bronze").count() == 4)
      node.grow(2)
      Cli.run(spark, Seq("ingest", "--wallet", "Wp",
        "--source", node.endpoint, "--poll", "1",
        "--poll-interval-ms", "0", "--limit", "100",
        "--output", s"$tmp/bronze"))
      val t = spark.read.parquet(s"$tmp/bronze")
      assert(t.count() == 6, "second invocation resumes from the on-disk cursor")
      assert(t.select("id").distinct().count() == 6)
    } finally node.stop()
  }

  test("live mode: --poll with a comma-separated --wallet list polls as a fleet") {
    val node = new RpcStubNode(total = 0, perWallet = Map("wa" -> 3, "wb" -> 2))
    val tmp = Files.createTempDirectory("clifleet").toString
    try {
      Cli.run(spark, Seq("ingest", "--wallet", "wa,wb",
        "--source", node.endpoint, "--poll", "1",
        "--poll-interval-ms", "0", "--limit", "100",
        "--output", s"$tmp/bronze"))
      val t = spark.read.parquet(s"$tmp/bronze")
      assert(t.count() == 5, "every wallet in the list is polled, not one comma-joined address")
      assert(t.select("wallet_address").distinct().count() == 2)
      node.growWallet("wb", 2)
      Cli.run(spark, Seq("ingest", "--wallet", "wa,wb",
        "--source", node.endpoint, "--poll", "1",
        "--poll-interval-ms", "0", "--limit", "100",
        "--output", s"$tmp/bronze"))
      assert(spark.read.parquet(s"$tmp/bronze").count() == 7,
        "re-invocation resumes from the persisted per-wallet cursor table")
    } finally node.stop()
  }
}

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
  }
}

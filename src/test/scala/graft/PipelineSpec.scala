package graft

import graft.analytics.LedgerQueries
import graft.sources.{JsonlBronzeSink, JsonlBronzeSource}
import java.nio.file.Files

/** End-to-end medallion flow: JSONL fixture → ingest → normalize → query,
  * replay-safe at every step (the reference's full API workflow).
  */
class PipelineSpec extends SparkSpec {

  test("ingest → normalize → ledger end to end, idempotent under replay") {
    val tmp = Files.createTempDirectory("pipe").toString
    val jsonl = s"$tmp/in"; val bronze = s"$tmp/bronze"; val silver = s"$tmp/silver"
    JsonlBronzeSink.write(LedgerQueries.fixtureBronze(spark), jsonl)
    val source = new JsonlBronzeSource(jsonl)
    val w = LedgerQueries.W

    assert(LedgerPipeline.ingest(spark, source, w, 100, bronze) == 5)
    assert(LedgerPipeline.normalize(spark, bronze, w, silver) == 4)

    // replay both steps: no new rows, state unchanged
    assert(LedgerPipeline.ingest(spark, source, w, 100, bronze) == 0)
    assert(LedgerPipeline.normalize(spark, bronze, w, silver) == 0)

    val txs = LedgerPipeline.transactions(spark, bronze, w).collect()
    assert(txs.length == 5)

    val entries = LedgerPipeline.ledger(spark, silver, w)
      .select("transaction_id", "asset_symbol", "amount").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(entries == Seq(
      ("tx1", "SOL", -0.5), ("tx2", "MintA", 2.5),
      ("tx2", "MintB", 3.0), ("tx5", "MintD", 4.0)))

    // typed surface: the Dataset[LedgerEntry] view decodes the same rows
    val typed = LedgerPipeline.ledgerTyped(spark, silver, w).collect()
    assert(typed.map(e => (e.transaction_id, e.asset_symbol, e.amount)).toSeq == entries)
    assert(typed.forall(_.fiat_value.isEmpty), "fiat_value stays None (parser.rs:38,78)")

    // scale property: the by-wallet read prunes to the wallet's hash-bucket
    // partition (PartitionFilters on _bucket), instead of scanning the table
    val plan = LedgerPipeline.transactions(spark, bronze, w)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("_bucket")),
      s"no _bucket partition filter in scan:\n$plan")
  }

  test("jdbc-backed pipeline: same flow, same values, database tables (repo.rs deployment shape)") {
    import graft.sources.JdbcLedgerPipeline
    val tmp = Files.createTempDirectory("jpipe").toString
    val jsonl = s"$tmp/in"
    val url = s"jdbc:derby:$tmp/db;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    JsonlBronzeSink.write(LedgerQueries.fixtureBronze(spark), jsonl)
    val source = new JsonlBronzeSource(jsonl)
    val w = LedgerQueries.W

    assert(JdbcLedgerPipeline.ingest(spark, source, w, 100, url, opts) == 5)
    assert(JdbcLedgerPipeline.normalize(spark, url, w, opts) == 4)
    // replay both steps: ON CONFLICT DO NOTHING semantics over JDBC
    assert(JdbcLedgerPipeline.ingest(spark, source, w, 100, url, opts) == 0)
    assert(JdbcLedgerPipeline.normalize(spark, url, w, opts) == 0)

    assert(JdbcLedgerPipeline.transactions(spark, url, w, opts).count() == 5)
    // values equal the parquet pipeline's golden ledger, in the same order
    val entries = JdbcLedgerPipeline.ledger(spark, url, w, opts)
      .select("transaction_id", "asset_symbol", "amount").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(entries == Seq(
      ("tx1", "SOL", -0.5), ("tx2", "MintA", 2.5),
      ("tx2", "MintB", 3.0), ("tx5", "MintD", 4.0)))
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The medallion flow persisted in a RELATIONAL store — the reference's
  * actual deployment shape (`adapters/src/repo.rs`: `transactions` +
  * `ledger_entries` tables in Postgres, keyed idempotent inserts,
  * by-wallet ordered reads). [[graft.LedgerPipeline]] proves the same
  * semantics over parquet; this facade proves them over any JDBC
  * database via [[JdbcStore]], so a reference user can keep their
  * database and swap only the engine.
  *
  * Table names and read orderings mirror repo.rs exactly:
  * `transactions` ordered by (timestamp) (repo.rs:73-107),
  * `ledger_entries` ordered by (transaction_id, asset_symbol)
  * (repo.rs:109-149, the deterministic refinement [[graft
  * .LedgerPipeline.ledger]] documents). Replays are no-ops by key
  * (`ON CONFLICT (id) DO NOTHING`, repo.rs:26,56).
  *
  * Scale: the by-wallet predicate pushes into the database (its
  * `(wallet, timestamp)` index serves it, init.sql:18-19); bulk
  * re-processing reads partition-parallel via Spark's JDBC
  * `partitionColumn` options passed through `options`.
  */
object JdbcLedgerPipeline {

  /** `POST /v1/ingest` against a database bronze table. Returns rows
    * actually inserted.
    */
  def ingest(spark: SparkSession, source: BronzeSource, wallet: String,
      limit: Int, url: String,
      options: Map[String, String] = Map.empty): Long =
    JdbcStore.saveIdempotent(spark,
      source.fetchHistory(spark, wallet, limit), url, "transactions", "id",
      options)

  /** `POST /v1/normalize`: read the wallet's bronze rows back from the
    * database, run the per-chain dispatch union, idempotently insert the
    * ledger entries. Returns rows actually inserted.
    */
  def normalize(spark: SparkSession, url: String, wallet: String,
      options: Map[String, String] = Map.empty): Long = {
    val bronze = JdbcStore.readByWallet(spark, url, "transactions", wallet,
      Seq("timestamp", "id"), options)
    JdbcStore.saveIdempotent(spark,
      graft.normalize.ChainNormalizers.normalizeAll(bronze),
      url, "ledger_entries", "id", options)
  }

  /** `GET /v1/transactions/:wallet` (repo.rs:73-107). */
  def transactions(spark: SparkSession, url: String, wallet: String,
      options: Map[String, String] = Map.empty): DataFrame =
    JdbcStore.readByWallet(spark, url, "transactions", wallet,
      Seq("timestamp"), options)

  /** `GET /v1/ledger/:wallet` (repo.rs:109-149). */
  def ledger(spark: SparkSession, url: String, wallet: String,
      options: Map[String, String] = Map.empty): DataFrame =
    JdbcStore.readByWallet(spark, url, "ledger_entries", wallet,
      Seq("transaction_id", "asset_symbol"), options)
}

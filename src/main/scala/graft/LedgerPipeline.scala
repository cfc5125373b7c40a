package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.normalize.SolanaNormalizer
import graft.operators.IdempotentSink
import graft.sources.BronzeSource

/** End-to-end medallion workflow — the engine-side equivalent of the
  * reference's four API operations (`/root/reference/api/src/main.rs:32-38`):
  *
  *  - `POST /v1/ingest`        → [[ingest]]       (fetch → idempotent bronze)
  *  - `POST /v1/normalize`     → [[normalize]]    (bronze → idempotent silver)
  *  - `GET /v1/transactions/:w` → [[transactions]] (by-wallet ordered scan)
  *  - `GET /v1/ledger/:w`      → [[ledger]]       (by-wallet ordered scan)
  *
  * Tables are parquet paths; both writes go through [[IdempotentSink]]
  * (the `ON CONFLICT (id) DO NOTHING` semantics, repo.rs:26,56), so every
  * step is replay-safe — the reference's only write guarantee, kept.
  *
  * Scale: ingest/normalize are append-only partitioned writes; the read
  * queries push the wallet filter into the parquet scan. At 100 TB the
  * tables would be written bucketed by wallet (layout decision of the
  * writer; the queries are layout-agnostic).
  */
object LedgerPipeline {

  /** Ingest a wallet's history into the bronze table. Returns rows appended. */
  def ingest(spark: SparkSession, source: BronzeSource, wallet: String,
      limit: Int, bronzePath: String): Long =
    IdempotentSink.appendOnce(spark,
      source.fetchHistory(spark, wallet, limit), bronzePath, "id")

  /** Normalize a wallet's bronze rows into the silver ledger table.
    * Chain dispatch matches the reference: only solana parses, other
    * chains contribute nothing (api/main.rs:101-106). Returns rows appended.
    */
  def normalize(spark: SparkSession, bronzePath: String, wallet: String,
      silverPath: String): Long = {
    val bronze = spark.read.parquet(bronzePath)
      .filter(col("wallet_address") === wallet)
    IdempotentSink.appendOnce(spark, SolanaNormalizer.normalize(bronze),
      silverPath, "id")
  }

  /** `GET /v1/transactions/:wallet` (repo.rs:73-107). */
  def transactions(spark: SparkSession, bronzePath: String, wallet: String): DataFrame =
    spark.read.parquet(bronzePath)
      .filter(col("wallet_address") === wallet)
      .orderBy("timestamp")

  /** `GET /v1/ledger/:wallet` (repo.rs:109-149). */
  def ledger(spark: SparkSession, silverPath: String, wallet: String): DataFrame =
    spark.read.parquet(silverPath)
      .filter(col("wallet_address") === wallet)
      .orderBy("transaction_id", "asset_symbol")
}

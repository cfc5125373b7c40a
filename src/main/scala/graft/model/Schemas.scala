package graft.model

import org.apache.spark.sql.types._

/** Engine data model — medallion architecture derived from the reference's
  * Rust structs (`/root/reference/core/src/models.rs:21-44`) and SQL DDL
  * (`/root/reference/migrations/20251219000000_init.sql:6-35`,
  * `/root/reference/migrations/20251219010000_add_wallet_to_ledger.sql:2`).
  */

/** Bronze layer: one raw immutable on-chain transaction.
  * Mirrors `Transaction` (`core/src/models.rs:21-31`); `raw_metadata` is the
  * JSON envelope string, parsed on demand with [[Schemas.solanaTx]].
  */
final case class Transaction(
    id: String,
    user_id: String,
    wallet_address: String,
    timestamp: Long,
    tx_hash: String,
    chain: String,
    raw_metadata: String)

/** Silver layer: one normalized per-asset ledger entry.
  * Mirrors `LedgerEntry` (`core/src/models.rs:33-44`) plus the denormalized
  * `wallet_address` from the backfill migration.
  *
  * `amount` is `Double` to stay byte-faithful to the reference, which routes
  * all amounts through `f64` (`adapters/src/solana_parser.rs:36,76,90-92`);
  * a DecimalType(38,18) upgrade is the documented correctness improvement
  * but would diverge from reference outputs on pathological floats.
  */
final case class LedgerEntry(
    id: String,
    transaction_id: String,
    user_id: String,
    wallet_address: String,
    asset_symbol: String,
    amount: Double,
    entry_type: String,
    fiat_value: Option[Double])

object Chain {
  val Solana = "solana"
  val Hyperliquid = "hyperliquid"
  val Ethereum = "ethereum"
  val all: Seq[String] = Seq(Solana, Hyperliquid, Ethereum)
}

object EntryType {
  val Trade = "trade"
  val Fee = "fee"
  val Transfer = "transfer"
  val Staking = "staking"
  val Income = "income"
  val all: Seq[String] = Seq(Trade, Fee, Transfer, Staking, Income)
}

object Schemas {

  /** Solana transaction envelope — only the fields the normalizer reads
    * (`/root/reference/adapters/src/solana_parser.rs:12-93`). Explicit
    * schema: production paths never infer.
    */
  val uiTokenAmount: StructType = StructType(Seq(
    StructField("uiAmount", DoubleType),
    StructField("decimals", IntegerType),
    StructField("amount", StringType)))

  val tokenBalance: StructType = StructType(Seq(
    StructField("accountIndex", IntegerType),
    StructField("mint", StringType),
    StructField("owner", StringType),
    StructField("uiTokenAmount", uiTokenAmount)))

  val accountKey: StructType = StructType(Seq(
    StructField("pubkey", StringType),
    StructField("signer", BooleanType),
    StructField("writable", BooleanType)))

  val solanaTx: StructType = StructType(Seq(
    StructField("slot", LongType),
    StructField("blockTime", LongType),
    StructField("transaction", StructType(Seq(
      StructField("signatures", ArrayType(StringType)),
      StructField("message", StructType(Seq(
        StructField("accountKeys", ArrayType(accountKey)),
        StructField("recentBlockhash", StringType))))))),
    StructField("meta", StructType(Seq(
      StructField("fee", LongType),
      StructField("preBalances", ArrayType(LongType)),
      StructField("postBalances", ArrayType(LongType)),
      StructField("preTokenBalances", ArrayType(tokenBalance)),
      StructField("postTokenBalances", ArrayType(tokenBalance)))))))

  /** Ethereum transaction envelope — the engine's second-chain branch
    * completing the reference's 3-variant `Chain` design
    * (`core/src/models.rs:5-10`; the reference dispatches only Solana,
    * `cli/src/main.rs:152-161`). Minimal native-transfer shape: value in
    * wei, from/to addresses.
    */
  val ethTx: StructType = StructType(Seq(
    StructField("from", StringType),
    StructField("to", StringType),
    // DECIMAL(38,0), not LongType: wei values overflow int64 at ~9.22 ETH
    // (Long.MaxValue = 9.22e18 wei) — a LongType schema would null the
    // struct on any whale transfer and silently drop it
    StructField("value", DecimalType(38, 0)),
    StructField("status", IntegerType)))

  /** Hyperliquid perp-fill envelope — the third and final `Chain` variant
    * (`core/src/models.rs:5-10`; the reference declares it but ships no
    * parser, so this branch is parity-plus). Shape follows Hyperliquid's
    * public info-API fill records, which serialize numeric fields as JSON
    * strings (`"sz": "0.5"`) — the schema keeps them as strings and the
    * normalizer casts explicitly, making the parse bit-identical to the
    * oracle's json_extract_string + CAST path.
    */
  val hlFill: StructType = StructType(Seq(
    StructField("coin", StringType),
    StructField("px", StringType),
    StructField("sz", StringType),
    StructField("side", StringType),
    StructField("time", LongType),
    StructField("closedPnl", StringType),
    StructField("fee", StringType),
    StructField("feeToken", StringType)))

  /** Bronze table schema (`transactions`). */
  val bronze: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("user_id", StringType),
    StructField("wallet_address", StringType),
    StructField("timestamp", LongType),
    StructField("tx_hash", StringType),
    StructField("chain", StringType),
    StructField("raw_metadata", StringType)))

  /** Silver table schema (`ledger_entries`). */
  val silver: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("transaction_id", StringType),
    StructField("user_id", StringType),
    StructField("wallet_address", StringType),
    StructField("asset_symbol", StringType),
    StructField("amount", DoubleType),
    StructField("entry_type", StringType),
    StructField("fiat_value", DoubleType)))
}

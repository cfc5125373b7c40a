package graft.normalize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{Chain, EntryType, Schemas}

/** Ethereum bronze → silver normalizer — the engine's second chain branch.
  *
  * The reference declares three `Chain` variants
  * (`/root/reference/core/src/models.rs:5-10`) but parses only Solana,
  * skipping other chains with a message (`cli/src/main.rs:152-161`). This
  * branch completes the multi-chain design with the minimal Ethereum
  * native-transfer semantics, mirroring the Solana normalizer's contract:
  *
  *  - envelope parse guard: missing/unparseable `value` ⇒ zero entries
  *    (the `meta`-guard analogue, parser.rs:15-18)
  *  - reverted transactions (`status` = 0) move no funds ⇒ zero entries;
  *    a missing/null status (pre-Byzantium receipts) counts as success
  *  - net wallet delta: +value if the tracked wallet is `to`, −value if it
  *    is `from` — a self-transfer nets to 0 and is dropped by the dust
  *    filter. Address comparison is case-folded: Ethereum addresses are
  *    case-insensitive (EIP-55 checksums vary the hex case per source)
  *  - value is DECIMAL(38,0) wei (int64 overflows at ~9.22 ETH), then
  *    wei→ETH at 1e18 into f64 (same double policy as the SOL path)
  *  - dust filter |Δ| > 1e-6, deterministic surrogate id from the bronze
  *    row id, entry_type 'transfer'
  */
object EthereumNormalizer {

  private val Dust = 1e-6
  private val WeiPerEth = 1e18

  def normalize(bronze: DataFrame): DataFrame = {
    // Same single-pass entries-array shape as SolanaNormalizer, for the
    // same reason: parse-guard and dust predicates as Filter nodes would be
    // pushed below the parse projection and re-inline from_json per
    // predicate; as array guards they stay inside the one parse pass, and
    // guarded-out rows explode to zero entries.
    val parsed = bronze
      .filter(col("chain") === lit(Chain.Ethereum))
      .withColumn("m", from_json(col("raw_metadata"), Schemas.ethTx))
    val wallet = lower(col("wallet_address"))
    val in = when(lower(col("m.to")) === wallet, col("m.value")).otherwise(lit(0L))
    val out = when(lower(col("m.from")) === wallet, col("m.value")).otherwise(lit(0L))
    val amount = (in - out).cast("double") / lit(WeiPerEth)
    val statusOk = col("m.status").isNull || col("m.status") === 1
    val emptyEntries = array().cast("array<struct<amount:double>>")
    val entries =
      when(col("m.value").isNotNull && statusOk,
        when(abs(amount) > Dust, array(struct(amount.as("amount"))))
          .otherwise(emptyEntries))
        .otherwise(emptyEntries)
    parsed
      .select(col("id"), col("user_id"), col("wallet_address"),
        explode(entries).as("e"))
      .select(
        sha2(concat_ws(":", col("id"), lit("ETH"), lit("native")), 256).as("id"),
        col("id").as("transaction_id"),
        col("user_id"),
        col("wallet_address"),
        lit("ETH").as("asset_symbol"),
        col("e.amount").as("amount"),
        lit(EntryType.Transfer).as("entry_type"),
        lit(null).cast("double").as("fiat_value"))
  }
}

/** Hyperliquid bronze → silver normalizer — the third chain branch,
  * completing the reference's 3-variant `Chain` enum
  * (`/root/reference/core/src/models.rs:5-10`; the reference declares the
  * variant but ships no parser, so this is parity-plus). One perp fill
  * normalizes to up to TWO ledger entries, exercising the `trade`/`fee`
  * `EntryType` variants the transfer chains never emit
  * (`core/src/models.rs:13-19`):
  *
  *  - a `trade` entry: ±sz of `coin` (B = buy = +, A = ask/sell = −),
  *    guarded on a known side and |sz| above the shared 1e-6 dust
  *    threshold
  *  - a `fee` entry: −fee in `feeToken` (USDC default — the settlement
  *    asset), emitted whenever fee > dust, INDEPENDENTLY of the trade
  *    guard (a malformed fill that still charged a fee keeps the fee
  *    visible in the ledger)
  *
  * Same single-pass entries-array shape as the other two normalizers (one
  * from_json per row; guards live inside the projected array, not in
  * pushable Filter nodes), same deterministic sha2 surrogate id keyed by
  * (bronze id, chain tag, entry kind, asset).
  */
object HyperliquidNormalizer {

  private val Dust = 1e-6

  def normalize(bronze: DataFrame): DataFrame = {
    val parsed = bronze
      .filter(col("chain") === lit(Chain.Hyperliquid))
      .withColumn("m", from_json(col("raw_metadata"), Schemas.hlFill))
    val sz = col("m.sz").cast("double")
    val signed = when(col("m.side") === "B", sz).otherwise(-sz)
    val fee = col("m.fee").cast("double")
    val tradeEntry = struct(col("m.coin").as("asset"), signed.as("amount"),
      lit(EntryType.Trade).as("etype"))
    val feeEntry = struct(coalesce(col("m.feeToken"), lit("USDC")).as("asset"),
      (-fee).as("amount"), lit(EntryType.Fee).as("etype"))
    val empty = array().cast("array<struct<asset:string,amount:double,etype:string>>")
    val entries = concat(
      when(col("m.coin").isNotNull && col("m.side").isin("B", "A")
          && sz.isNotNull && abs(signed) > Dust,
        array(tradeEntry)).otherwise(empty),
      when(fee.isNotNull && fee > Dust, array(feeEntry)).otherwise(empty))
    parsed
      .select(col("id"), col("user_id"), col("wallet_address"),
        explode(entries).as("e"))
      .select(
        sha2(concat_ws(":", col("id"), lit("HL"), col("e.etype"), col("e.asset")), 256).as("id"),
        col("id").as("transaction_id"),
        col("user_id"),
        col("wallet_address"),
        col("e.asset").as("asset_symbol"),
        col("e.amount").as("amount"),
        col("e.etype").as("entry_type"),
        lit(null).cast("double").as("fiat_value"))
  }
}

/** Per-chain dispatch (B5) + union (G1): route bronze rows to their chain's
  * normalizer and union the silver outputs by name — all three `Chain`
  * variants now carry a parser.
  *
  * Scale note: the union arms each scan the bronze source (Spark has no
  * subplan reuse across union arms), but each arm's `chain = '<x>'` filter
  * pushes into the parquet reader, so with chain-dictionary row-group
  * stats an arm skips the other chains' row groups — the per-arm cost is
  * ~that chain's share of the table, not a full re-scan. Writing bronze
  * partitioned by chain (the production layout) turns it into exact
  * directory pruning.
  */
object ChainNormalizers {

  def normalizeAll(bronze: DataFrame): DataFrame =
    SolanaNormalizer.normalize(bronze)
      .unionByName(EthereumNormalizer.normalize(bronze))
      .unionByName(HyperliquidNormalizer.normalize(bronze))
}

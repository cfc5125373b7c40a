package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Source layer — the Spark re-foundation of the reference's pluggable
  * ingestion abstraction `trait ChainIngestor { fetch_history(wallet, limit)
  * -> Vec<Transaction> }` (`/root/reference/core/src/models.rs:46-49`).
  *
  * A source yields a bronze `DataFrame` (schema [[Schemas.bronze]]) instead
  * of a `Vec`: history fetches become partitioned scans, and the per-item
  * error-skip semantics of the reference's RPC loop
  * (`/root/reference/adapters/src/solana.rs:51-53`) become PERMISSIVE-mode
  * reads where corrupt records yield null rows that downstream meta-guards
  * drop (SURVEY.md §2.A1).
  */
trait ChainIngestor {

  /** Full history for one wallet, at most `limit` rows, as a bronze
    * DataFrame — the `fetch_history` contract
    * (`core/src/models.rs:46-49`). Implemented by every file-backed
    * [[BronzeSource]] (scan-shaped) and by the wire client
    * [[RpcChainIngestor]] (distributed RPC fan-out).
    */
  def fetchHistory(spark: SparkSession, wallet: String, limit: Int): DataFrame
}

trait BronzeSource extends ChainIngestor {

  /** Whole-table bronze read (schema [[Schemas.bronze]]). */
  def read(spark: SparkSession): DataFrame

  /** Full history scan for one wallet, oldest-first, at most `limit` rows —
    * the `fetch_history` contract. Final: one definition of the contract,
    * shared by every format; sources only supply [[read]].
    */
  final override def fetchHistory(spark: SparkSession, wallet: String, limit: Int): DataFrame =
    read(spark)
      .filter(col("wallet_address") === wallet)
      .orderBy("timestamp")
      .limit(limit)
}

/** A3: JSONL bronze source — one JSON transaction per line
  * (`/root/reference/cli/src/main.rs:126-134`). Explicit schema, no
  * inference; corrupt lines drop via the PERMISSIVE null-row path.
  */
final class JsonlBronzeSource(path: String) extends BronzeSource {
  override def read(spark: SparkSession): DataFrame =
    spark.read.schema(Schemas.bronze).json(path).filter(col("id").isNotNull)
}

/** Parquet bronze source — the engine-native table layout. At scale the
  * table is written bucketed by wallet so this prunes instead of scanning.
  */
final class ParquetBronzeSource(path: String) extends BronzeSource {
  override def read(spark: SparkSession): DataFrame =
    spark.read.parquet(path)
}

/** A4: JSONL bronze sink (`/root/reference/cli/src/main.rs:106-113`). */
object JsonlBronzeSink {
  def write(bronze: DataFrame, path: String): Unit =
    bronze.write.mode("overwrite").json(path)
}

/** CSV bronze source — interop format for legacy/export pipelines. The
  * `raw_metadata` column embeds quotes and commas, so BOTH sides pin
  * RFC-4180 double-quote escaping (`escape = "`): Spark's default escape is
  * backslash, which does not round-trip embedded JSON written by other
  * tools (and vice versa).
  */
final class CsvBronzeSource(path: String) extends BronzeSource {
  override def read(spark: SparkSession): DataFrame =
    spark.read.schema(Schemas.bronze)
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)
      .filter(col("id").isNotNull)
}

/** CSV bronze sink — same RFC-4180 escaping contract as the source. The
  * columns are written in [[Schemas.bronze]] order regardless of the input
  * DataFrame's layout: the reader binds by POSITION (an explicit schema
  * with header=true skips the header rather than matching by name), so a
  * caller-reordered DataFrame would otherwise round-trip with silently
  * swapped same-typed fields.
  */
object CsvBronzeSink {
  def write(bronze: DataFrame, path: String): Unit =
    bronze.select(Schemas.bronze.fieldNames.map(col(_)): _*)
      .write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)
}

/** ORC bronze source — the columnar alternative where the lakehouse
  * standard is ORC rather than parquet; same pushdown/pruning behavior.
  */
final class OrcBronzeSource(path: String) extends BronzeSource {
  override def read(spark: SparkSession): DataFrame =
    spark.read.orc(path)
}

/** ORC bronze sink. */
object OrcBronzeSink {
  def write(bronze: DataFrame, path: String): Unit =
    bronze.write.mode("overwrite").orc(path)
}

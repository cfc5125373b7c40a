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

/** A3+ quarantine read: the PERMISSIVE drop upgraded to drop-AND-RETAIN.
  *
  * The reference (and [[JsonlBronzeSource]]) log-and-skip corrupt input
  * (`solana.rs:51-53`); at 100 TB "skip" silently deletes data — an
  * upstream format drift can shed a percent of the feed for days before
  * anyone notices. This read splits one JSONL scan into (good bronze
  * rows, quarantined raw lines): lines go through `from_json` with a
  * corrupt-record capture column (NOT the reader-level
  * `columnNameOfCorruptRecord`, whose corrupt-only projections Spark
  * disallows without a cache), so both branches are plain projections of
  * the same text scan — no cache, no second parse, and the quarantine
  * frame carries the VERBATIM line for later replay.
  *
  * Replay contract: fix upstream, then feed the quarantine parquet's
  * `raw_line` back through this same reader (or any JSONL path) — ids are
  * row-content-derived everywhere in the engine, so re-admitted rows
  * compose with the idempotent sinks.
  */
object QuarantinedJsonl {

  /** (good rows in [[Schemas.bronze]], quarantine: raw_line + file). */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{StringType, StructType}
    val schema = Schemas.bronze.fields.foldLeft(new StructType())(_ add _)
      .add("_corrupt", StringType)
    val lines = spark.read.text(path)
      .select(col("value"), input_file_name().as("src_file"))
    val parsed = lines.select(
      from_json(col("value"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")
      ).as("r"), col("value"), col("src_file"))
    // a line parses as "good" only if it bound the required identity
    // fields; a syntactically-valid-but-wrong-shape line (e.g. a JSON
    // array, or an object missing id) quarantines too
    val ok = col("r").isNotNull &&
      col("r._corrupt").isNull && col("r.id").isNotNull
    val good = parsed.filter(ok)
      .select(Schemas.bronze.fieldNames.map(f => col(s"r.$f")).toSeq: _*)
    val quarantine = parsed.filter(!ok)
      .select(col("value").as("raw_line"), col("src_file"))
    (good, quarantine)
  }

  /** One-call ingest split: good rows returned, quarantine appended as
    * parquet at `quarantinePath` (append: quarantine accretes across
    * ingest runs; dedup happens at replay through the keyed sinks).
    */
  def readAndQuarantine(spark: SparkSession, path: String,
      quarantinePath: String): DataFrame = {
    val (good, bad) = read(spark, path)
    bad.write.mode("append").parquet(quarantinePath)
    good
  }
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

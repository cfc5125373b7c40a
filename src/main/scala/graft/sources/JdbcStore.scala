package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-store parity — the reference persists bronze/silver to
  * Postgres (`/root/reference/adapters/src/repo.rs:13-149`): keyed
  * idempotent inserts (`ON CONFLICT (id) DO NOTHING`, repo.rs:26,56) and
  * by-wallet ordered reads (repo.rs:73-149). This is the same contract
  * over Spark's JDBC source/sink, so an engine user can point the medallion
  * flow at a database instead of parquet without changing semantics.
  *
  * Scale shape mirrors [[graft.operators.IdempotentSink]]: the existence
  * probe reads ONLY the key column (column pruning pushes `SELECT key` into
  * the database), the incoming batch's keys broadcast so the table-side
  * scan never shuffles, and the by-wallet read pushes its predicate into
  * the database's WHERE clause (the JDBC analogue of the reference's
  * `(wallet, timestamp)` B-tree index, init.sql:18-19 — asserted via
  * `PushedFilters` in SourcesSpec). Partitioned parallel reads
  * (`partitionColumn`/`numPartitions`) apply unchanged for big tables.
  *
  * Concurrency contract: Postgres serializes `ON CONFLICT` per statement;
  * a check-then-write over plain JDBC is not atomic, so this store keeps
  * the engine-wide single-writer-per-table rule (see
  * [[graft.operators.IdempotentSink.withTableLock]]'s rationale). Replays
  * of the SAME batch are no-ops by construction.
  *
  * String columns map to VARCHAR via `createTableColumnTypes` — some
  * embedded dialects (Derby) default strings to CLOB, which cannot sit in
  * a pushed equality predicate.
  */
object JdbcStore {

  /** Column-type overrides for table creation: every string column becomes
    * a comparable VARCHAR. Derived from the batch schema, so any flat
    * schema works. 32000 sits under Derby's 32672 VARCHAR cap and holds
    * the raw JSON envelopes; payloads beyond that belong in the lake, not
    * a relational row (the reference stores them as Postgres TEXT).
    */
  private def varcharTypes(df: DataFrame): String =
    df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType =>
        s"${f.name} VARCHAR(32000)"
    }.mkString(", ")

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Append `batch` rows whose `keyCol` is not already present in `table`;
    * creates the table (VARCHAR strings, from the batch schema) on first
    * write. Returns rows actually appended. The reference's
    * `save_transactions`/`save_ledger_entries` (repo.rs:13-71).
    */
  def saveIdempotent(spark: SparkSession, batch: DataFrame, url: String,
      table: String, keyCol: String,
      options: Map[String, String] = Map.empty): Long = {
    val deduped = batch.dropDuplicates(keyCol)
    val existed = tableExists(url, table, options)
    val fresh =
      if (!existed) deduped
      else {
        val existingKeys = spark.read
          .format("jdbc").option("url", url).option("dbtable", table)
          .options(options).load()
          .select(col(keyCol)) // prunes to SELECT keyCol in the database
        val dupKeys = existingKeys
          .join(broadcast(deduped.select(col(keyCol))), Seq(keyCol), "left_semi")
        deduped.join(dupKeys, Seq(keyCol), "left_anti")
      }
    // one bounded count, then append — same two-phase shape as appendOnce;
    // localCheckpoint pins the anti-join result so the append's JDBC reads
    // can't observe the table mid-mutation
    val pinned = fresh.localCheckpoint(true)
    val n = pinned.count()
    // an empty FIRST batch still creates the table (the migrations/init-db
    // use case); empty appends to an existing table stay no-ops
    if (n > 0 || !existed)
      pinned.write.mode(SaveMode.Append)
        .option("createTableColumnTypes", varcharTypes(batch))
        .options(options)
        .jdbc(url, table, props(options))
    n
  }

  /** Whole-table read. */
  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).options(options).load()

  /** By-wallet ordered read — `get_transactions_by_wallet` /
    * `get_ledger_entries_by_wallet` (repo.rs:73-149). The wallet equality
    * pushes into the database's WHERE; ordering runs in Spark (JDBC
    * sources don't guarantee result order).
    */
  def readByWallet(spark: SparkSession, url: String, table: String,
      wallet: String, orderCols: Seq[String],
      options: Map[String, String] = Map.empty): DataFrame =
    read(spark, url, table, options)
      .filter(col("wallet_address") === wallet)
      .orderBy(orderCols.map(col): _*)

  /** Existence probe honors the same credentials/driver the Spark JDBC
    * calls get via `options` — a URL without embedded credentials (the
    * normal Postgres deployment shape: user/password in options) must
    * probe with them, and a driver named only in options must be loaded
    * before DriverManager can route the URL.
    */
  private def tableExists(url: String, table: String,
      options: Map[String, String]): Boolean = {
    options.get("driver").foreach(Class.forName)
    val conn = DriverManager.getConnection(url,
      props(options.view.filterKeys(Set("user", "password")).toMap))
    try {
      // unquoted identifiers are case-normalized by the database; probe
      // both the given and upper-cased spellings
      val md = conn.getMetaData
      Seq(table, table.toUpperCase(java.util.Locale.ROOT)).exists { t =>
        val rs = md.getTables(null, null, t, null)
        try rs.next() finally rs.close()
      }
    } finally conn.close()
  }
}

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

  /** Postgres URL? The reference's exact dialect gets its native
    * statement; everything else takes the dialect-neutral anti-join.
    */
  private[sources] def isPostgres(url: String): Boolean =
    url.startsWith("jdbc:postgresql:")

  /** Spark JDBC-source option keys that are NOT driver connection
    * properties — everything else in `options` is forwarded verbatim to
    * executor-side `DriverManager` connections (ssl, currentSchema,
    * connectTimeout, …), so the native-upsert leg connects exactly like
    * Spark's own reader/writer would.
    */
  private val sparkOnlyOptionKeys: Set[String] = Set(
    "url", "dbtable", "query", "driver", "partitioncolumn", "lowerbound",
    "upperbound", "numpartitions", "fetchsize", "batchsize", "truncate",
    "isolationlevel", "sessioninitstatement", "customschema",
    "pushdownpredicate", "pushdownaggregate", "pushdownlimit",
    "pushdownoffset", "pushdowntablesample", "createtableoptions",
    "createtablecolumntypes", "cascadetruncate", "querytimeout",
    "keytab", "principal", "refreshkrb5config", "connectionprovider",
    "preparequery", "infertimestampntztype")

  private def connectionProps(options: Map[String, String]): Properties =
    props(options.filter { case (k, _) =>
      !sparkOnlyOptionKeys.contains(k.toLowerCase(java.util.Locale.ROOT))
    })

  /** Does `table` carry a unique index / primary key whose SINGLE column
    * is `keyCol`? `ON CONFLICT (keyCol)` requires one server-side — a
    * pre-existing table without it must take the anti-join path instead
    * of failing at the first `executeBatch`. Probed through standard
    * `DatabaseMetaData.getIndexInfo(unique = true)`, so the check is
    * dialect-neutral (Derby-tested offline; Postgres reports PK and
    * UNIQUE indexes the same way).
    */
  private[sources] def hasUniqueKey(url: String, table: String,
      keyCol: String, options: Map[String, String]): Boolean = {
    options.get("driver").foreach(Class.forName)
    val conn = DriverManager.getConnection(url, connectionProps(options))
    try {
      val md = conn.getMetaData
      Seq(table, table.toUpperCase(java.util.Locale.ROOT)).exists { t =>
        val rs = md.getIndexInfo(null, null, t, true, false)
        try {
          // group index columns by index name; a qualifying index covers
          // EXACTLY the key column (a composite unique key does not
          // satisfy ON CONFLICT (keyCol))
          val colsByIndex = scala.collection.mutable.Map
            .empty[String, scala.collection.mutable.Buffer[String]]
          while (rs.next()) {
            val idx = rs.getString("INDEX_NAME")
            val c = rs.getString("COLUMN_NAME")
            if (idx != null && c != null)
              colsByIndex.getOrElseUpdate(idx,
                scala.collection.mutable.Buffer.empty) += c
          }
          colsByIndex.values.exists(cs =>
            cs.length == 1 && cs.head.equalsIgnoreCase(keyCol))
        } finally rs.close()
      }
    } finally conn.close()
  }

  /** The reference's idempotent-insert statement, verbatim shape
    * (`INSERT … ON CONFLICT (id) DO NOTHING`, repo.rs:26,56), generated
    * from the batch schema. Golden-checked in JdbcStoreSpec.
    */
  private[sources] def upsertSql(table: String, cols: Seq[String],
      keyCol: String): String = {
    require(cols.contains(keyCol), s"key column $keyCol not in ${cols.mkString(", ")}")
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT ($keyCol) DO NOTHING"
  }

  /** Append `batch` rows whose `keyCol` is not already present in `table`;
    * creates the table (VARCHAR strings, from the batch schema) on first
    * write. Returns rows actually appended. The reference's
    * `save_transactions`/`save_ledger_entries` (repo.rs:13-71).
    *
    * Dialect dispatch: a Postgres URL speaks the reference's native
    * `ON CONFLICT (key) DO NOTHING` — the database arbitrates key
    * conflicts per statement, so the read-keys round-trip disappears and
    * CONCURRENT writers become safe (the anti-join path's
    * check-then-write is only safe under the engine's single-writer
    * rule). `ON CONFLICT (keyCol)` requires a unique constraint on the
    * server — a fresh table gets `ADD PRIMARY KEY (keyCol)` DDL right
    * after creation (matching the reference's `id UUID PRIMARY KEY`,
    * init.sql), and a PRE-existing table is probed for one: without it
    * the native statement would fail server-side, so such tables fall
    * back to the anti-join merge. Every other dialect keeps the
    * anti-join merge below.
    */
  def saveIdempotent(spark: SparkSession, batch: DataFrame, url: String,
      table: String, keyCol: String,
      options: Map[String, String] = Map.empty): Long = {
    val deduped = batch.dropDuplicates(keyCol)
    val existed = tableExists(url, table, options)
    if (isPostgres(url) &&
        (!existed || hasUniqueKey(url, table, keyCol, options)))
      return savePostgresUpsert(spark, deduped, url, table, keyCol,
        options, existed, varcharTypes(batch))
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

  /** The Postgres leg of [[saveIdempotent]]: table creation through the
    * same Spark JDBC writer (empty append — VARCHAR overrides apply)
    * plus `ALTER TABLE … ADD PRIMARY KEY (keyCol)` DDL — `ON CONFLICT`
    * needs the unique constraint, and Spark's writer never declares one —
    * then per-partition `executeBatch` of the native upsert. Each
    * partition opens ONE connection (forwarding ALL caller options except
    * Spark-source keys, so ssl/currentSchema/… survive), streams its rows
    * through a prepared statement in 500-row batches, and commits once —
    * the executor-side shape of the reference's per-row `execute` loop
    * (repo.rs:21-31) at Spark parallelism. The returned count sums the
    * batch update counts (`ON CONFLICT DO NOTHING` reports 0 for a
    * conflict, 1 for an insert; `SUCCESS_NO_INFO` counts as inserted) and
    * is BEST-EFFORT under task retries in either direction: a retried
    * partition's committed rows conflict on the retry (under-report),
    * while `SUCCESS_NO_INFO` over-reports a no-op. Idempotence of the
    * TABLE is exact regardless; callers needing an exact delta should
    * diff key counts around the call.
    */
  private def savePostgresUpsert(spark: SparkSession, deduped: DataFrame,
      url: String, table: String, keyCol: String,
      options: Map[String, String], existed: Boolean,
      columnTypes: String): Long = {
    if (!existed) {
      deduped.limit(0).write.mode(SaveMode.Append)
        .option("createTableColumnTypes", columnTypes)
        .options(options)
        .jdbc(url, table, props(options))
      options.get("driver").foreach(Class.forName)
      val conn = DriverManager.getConnection(url, connectionProps(options))
      try {
        val st = conn.createStatement()
        try st.executeUpdate(s"ALTER TABLE $table ADD PRIMARY KEY ($keyCol)")
        finally st.close()
      } finally conn.close()
    }
    val sql = upsertSql(table, deduped.columns.toSeq, keyCol)
    val acc = spark.sparkContext.longAccumulator("pg_upsert_inserted")
    val nCols = deduped.columns.length
    val connOpts = options
    deduped.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        connOpts.get("driver").foreach(Class.forName)
        val conn = DriverManager.getConnection(url, connectionProps(connOpts))
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          try {
            var pending = 0
            def flush(): Unit = if (pending > 0) {
              st.executeBatch().foreach { c =>
                if (c > 0 || c == java.sql.Statement.SUCCESS_NO_INFO) acc.add(1L)
              }
              pending = 0
            }
            it.foreach { r =>
              var i = 0
              while (i < nCols) { st.setObject(i + 1, r.get(i)); i += 1 }
              st.addBatch()
              pending += 1
              if (pending == 500) flush()
            }
            flush()
            conn.commit()
          } finally st.close()
        } finally conn.close()
      }
    }
    acc.value
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
    val conn = DriverManager.getConnection(url, connectionProps(options))
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

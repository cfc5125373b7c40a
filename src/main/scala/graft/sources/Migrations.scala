package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** One ordered schema migration: `run` applies the step against the
  * database at `url` (raw DDL/DML over JDBC, or Spark-side table
  * creation — whatever the step needs).
  */
final case class Migration(version: Long, description: String,
    run: (SparkSession, String, Map[String, String]) => Unit)

/** Versioned migration runner — the `sqlx::migrate!` contract
  * (`/root/reference/cli/src/main.rs:70-78`) over JDBC: migrations apply
  * in version order exactly once, every application is RECORDED in
  * `graft_migrations`, a re-run is a no-op, and drift between the
  * recorded history and the registered steps fails loudly (sqlx's
  * altered/removed-migration errors).
  *
  * The registered history mirrors the reference's `migrations/` directory:
  *
  *  - `20251219000000 init` — create the empty bronze/silver tables
  *    (`migrations/20251219000000_init.sql`). The silver table is created
  *    WITHOUT `wallet_address`, as init.sql defines it.
  *  - `20251219010000 add_wallet_to_ledger` — add the column, BACKFILL it
  *    from `transactions` (the correlated-subquery form of init's
  *    `UPDATE … FROM`, portable to embedded dialects), enforce NOT NULL,
  *    and index it (`migrations/20251219010000_add_wallet_to_ledger.sql`).
  *
  * Scale note: migrations are DATABASE-side steps (DDL + one set-based
  * backfill UPDATE); nothing flows through the driver. The Spark-side
  * lake analogue of the same backfill is the declared `c3_backfill_join`.
  */
object Migrations {

  val LogTable = "graft_migrations"

  /** init.sql's silver shape: no wallet_address until the second step. */
  private[graft] val silverV0: StructType =
    StructType(graft.model.Schemas.silver.filterNot(_.name == "wallet_address"))

  val all: Seq[Migration] = Seq(
    Migration(20251219000000L, "init", (spark, url, opts) => {
      JdbcStore.saveIdempotent(spark,
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          graft.model.Schemas.bronze), url, "transactions", "id", opts)
      JdbcStore.saveIdempotent(spark,
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          silverV0), url, "ledger_entries", "id", opts)
    }),

    // column identifiers are QUOTED lowercase — Spark's JDBC writer
    // creates them that way (dialect.quoteIdentifier), so unquoted names
    // would case-normalize past them
    Migration(20251219010000L, "add_wallet_to_ledger", (_, url, opts) =>
      execSql(url, opts, Seq(
        """ALTER TABLE ledger_entries ADD COLUMN "wallet_address" VARCHAR(32000)""",
        // the reference's UPDATE…FROM backfill as a correlated subquery
        """UPDATE ledger_entries SET "wallet_address" =
          |  (SELECT t."wallet_address" FROM transactions t
          |   WHERE t."id" = ledger_entries."transaction_id")""".stripMargin,
        """ALTER TABLE ledger_entries ALTER COLUMN "wallet_address" NOT NULL""",
        """CREATE INDEX idx_ledger_wallet ON ledger_entries("wallet_address")"""))))

  /** Apply every registered migration not yet recorded, in version order;
    * returns the versions applied this call (empty = up to date). `upTo`
    * stops after the given version — the staged-deployment/test hook.
    */
  def migrate(spark: SparkSession, url: String,
      options: Map[String, String] = Map.empty,
      upTo: Option[Long] = None): Seq[Long] = {
    options.get("driver").foreach(Class.forName)
    ensureLog(url, options)
    val applied = appliedHistory(url, options)
    val registered = all.map(m => m.version -> m.description).toMap
    applied.foreach { case (v, desc) =>
      registered.get(v) match {
        case None =>
          sys.error(s"migration $v is recorded as applied but no longer registered")
        case Some(d) if d != desc =>
          sys.error(s"migration $v drifted: recorded '$desc', registered '$d'")
        case _ =>
      }
    }
    val todo = all
      .filter(m => !applied.contains(m.version))
      .filter(m => upTo.forall(m.version <= _))
      .sortBy(_.version)
    todo.foreach { m =>
      m.run(spark, url, options)
      record(url, options, m)
    }
    todo.map(_.version)
  }

  private def connect(url: String, options: Map[String, String]) = {
    options.get("driver").foreach(Class.forName)
    val p = new Properties()
    options.view.filterKeys(Set("user", "password"))
      .foreach { case (k, v) => p.setProperty(k, v) }
    DriverManager.getConnection(url, p)
  }

  private def execSql(url: String, options: Map[String, String],
      statements: Seq[String]): Unit = {
    val conn = connect(url, options)
    try {
      val st = conn.createStatement()
      try statements.foreach(st.executeUpdate)
      finally st.close()
    } finally conn.close()
  }

  private def ensureLog(url: String, options: Map[String, String]): Unit = {
    val conn = connect(url, options)
    try {
      val md = conn.getMetaData
      val exists = Seq(LogTable, LogTable.toUpperCase(java.util.Locale.ROOT))
        .exists { t =>
          val rs = md.getTables(null, null, t, null)
          try rs.next() finally rs.close()
        }
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(
          s"""CREATE TABLE $LogTable (
             |  version BIGINT NOT NULL PRIMARY KEY,
             |  description VARCHAR(255) NOT NULL,
             |  applied_at TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP)""".stripMargin)
        finally st.close()
      }
    } finally conn.close()
  }

  private def appliedHistory(url: String,
      options: Map[String, String]): Map[Long, String] = {
    val conn = connect(url, options)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"SELECT version, description FROM $LogTable")
        try {
          val b = Map.newBuilder[Long, String]
          while (rs.next()) b += rs.getLong(1) -> rs.getString(2)
          b.result()
        } finally rs.close()
      } finally st.close()
    } finally conn.close()
  }

  private def record(url: String, options: Map[String, String],
      m: Migration): Unit = {
    val conn = connect(url, options)
    try {
      val ps = conn.prepareStatement(
        s"INSERT INTO $LogTable (version, description) VALUES (?, ?)")
      try {
        ps.setLong(1, m.version)
        ps.setString(2, m.description)
        ps.executeUpdate(): Unit
      } finally ps.close()
    } finally conn.close()
  }
}

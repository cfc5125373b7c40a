package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sources._

/** Command-line surface — subcommand-for-subcommand parity with the
  * reference CLI (`/root/reference/cli/src/main.rs`):
  *
  *   - `init-db`    — create the empty `transactions`/`ledger_entries`
  *                    tables (the migrations step, main.rs:70-79)
  *   - `ingest`     — wallet history → bronze; DB first, fallback to
  *                    JSONL file (main.rs:81-113)
  *   - `normalize`  — bronze (JSONL path or `db:<wallet>`) → silver;
  *                    DB first, fallback to JSONL (main.rs:115-177)
  *
  * Usage (each `--key value`):
  *   runMain graft.Cli init-db --db <jdbcUrl> [--driver <class>]
  *   runMain graft.Cli ingest --wallet W --source <dir> [--format jsonl]
  *     [--limit 10] [--db <jdbcUrl>] [--output <dir>]
  *   runMain graft.Cli normalize --input <dir | db:wallet>
  *     [--db <jdbcUrl>] [--output <dir>]
  *
  * The reference's unsupported-chain rows are skipped inside
  * [[graft.normalize.ChainNormalizers.normalizeAll]] (parser-less chains
  * contribute no entries — main.rs:153-160's behavior, vectorized).
  */
object Cli {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-cli",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try run(spark, args.toSeq)
    finally spark.stop()
  }

  /** The testable core: parse + execute against a provided session. */
  def run(spark: SparkSession, args: Seq[String]): Unit = {
    require(args.nonEmpty, usage)
    val opts = parseFlags(args.tail)
    def jdbcOpts = opts.get("driver")
      .map(d => Map("driver" -> d)).getOrElse(Map.empty[String, String])
    args.head match {
      case "init-db" =>
        val url = opts.getOrElse("db", sys.error("init-db requires --db"))
        // versioned, recorded, replay-safe — sqlx::migrate! parity
        // (main.rs:70-78): unapplied steps run in order, applied ones
        // are skipped via the graft_migrations log
        println("Running migrations...") // main.rs:72 parity
        Migrations.migrate(spark, url, jdbcOpts)
        println("Database initialized successfully.") // main.rs:75 parity

      case "ingest" =>
        val wallet = opts.getOrElse("wallet", sys.error("ingest requires --wallet"))
        val limit = opts.getOrElse("limit", "10").toInt // main.rs default 10
        val source = ingestor(
          opts.getOrElse("source", sys.error("ingest requires --source")),
          opts.getOrElse("format", "jsonl"), opts.get("x-token"))
        // --wallet accepts a comma-separated list; against a live RPC
        // source the whole fleet fans out across executors in one pass
        // --poll N (live RPC source only): run the exactly-once poll loop
        // N rounds into --output instead of a one-shot fetch
        (source, opts.get("poll")) match {
          case (rpc: RpcChainIngestor, Some(rounds)) =>
            val table = opts.getOrElse("output", "bronze_transactions")
            val interval = opts.getOrElse("poll-interval-ms", "1000").toLong
            // a comma-separated --wallet list polls as a FLEET (one keyed
            // append per round serving every wallet), never as a single
            // bogus comma-joined address
            val ws = wallet.split(',').toSeq.filter(_.nonEmpty)
            val n =
              if (ws.length > 1)
                new RpcFleetPoller(rpc, table, ws, pageLimit = limit)
                  .run(spark, rounds.toInt, interval)
              else
                new RpcPoller(rpc, table, wallet, pageLimit = limit)
                  .run(spark, rounds.toInt, interval)
            println(s"Polled ${rounds.toInt} rounds; $n new transactions at $table.")
            return
          case _ => ()
        }
        val history = (source, wallet.split(',').toSeq.filter(_.nonEmpty)) match {
          case (rpc: RpcChainIngestor, ws) if ws.length > 1 =>
            rpc.fetchHistoryMany(spark, ws, limit)
          case _ => source.fetchHistory(spark, wallet, limit)
        }
        opts.get("db") match {
          case Some(url) => // DB first (main.rs:101-105)
            val n = JdbcStore.saveIdempotent(spark, history, url,
              "transactions", "id", jdbcOpts)
            println(s"Saved $n transactions to Database.")
          case None => // fallback to JSONL (main.rs:106-112)
            val out = opts.getOrElse("output", "bronze_transactions.jsonl")
            JsonlBronzeSink.write(history, out)
            println(s"Done! Data written to $out")
        }

      case "normalize" =>
        val input = opts.getOrElse("input", "bronze_transactions.jsonl")
        val bronze: DataFrame =
          if (input.startsWith("db:")) {
            val url = opts.getOrElse("db",
              sys.error("db: input requires --db"))
            JdbcStore.readByWallet(spark, url, "transactions",
              input.stripPrefix("db:"), Seq("timestamp", "id"), jdbcOpts)
          } else new JsonlBronzeSource(input).read(spark)
        val entries = graft.normalize.ChainNormalizers.normalizeAll(bronze)
        opts.get("db") match {
          case Some(url) =>
            val n = JdbcStore.saveIdempotent(spark, entries, url,
              "ledger_entries", "id", jdbcOpts)
            println(s"Saving $n ledger entries to Database...\nDone.")
          case None =>
            val out = opts.getOrElse("output", "silver_ledger.jsonl")
            entries.write.mode("overwrite").json(out)
            println(s"Done! Data written to $out")
        }

      case other => sys.error(s"unknown command: $other\n$usage")
    }
  }

  /** An `http(s)://` source is the live JSON-RPC node (solana.rs:23-28,
    * `--x-token` per the gRPC adapter's auth surface); anything else is a
    * file-backed bronze directory in the named format.
    */
  private def ingestor(src: String, format: String, xToken: Option[String]): ChainIngestor =
    if (src.startsWith("http://") || src.startsWith("https://"))
      new RpcChainIngestor(src, xToken)
    else format match {
      case "jsonl"   => new JsonlBronzeSource(src)
      case "parquet" => new ParquetBronzeSource(src)
      case "csv"     => new CsvBronzeSource(src)
      case "orc"     => new OrcBronzeSource(src)
      case other     => sys.error(s"unknown source format: $other")
    }

  private def parseFlags(args: Seq[String]): Map[String, String] =
    args.grouped(2).map {
      case Seq(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case bad => sys.error(s"expected --key value pairs, got: $bad\n$usage")
    }.toMap

  private val usage =
    """usage: graft.Cli <init-db|ingest|normalize> [--key value ...]"""
}

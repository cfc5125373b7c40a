package graft.sources

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, first}

import graft.operators.IdempotentSink

/** A2 at fleet cardinality: one poll round serves a WALLET UNIVERSE —
  * the production shape of the reference's per-wallet `ChainIngestor`
  * intent (`/root/reference/core/src/models.rs:46-49`) when "track this
  * wallet" becomes "track 10⁴ wallets".
  *
  * Composition of the two proven halves:
  *   - [[RpcChainIngestor.fetchSince]] distributes the per-wallet
  *     resume walk (page until the wallet's cursor appears) AND the
  *     detail fetches across executors — the driver never touches a
  *     signature, so round latency scales with `fetchPartitions` and the
  *     node's rate limit, not with fleet size.
  *   - [[IdempotentSink.appendOnce]] lands the whole round's batch in
  *     ONE keyed append — one anti-join, one write, regardless of how
  *     many wallets contributed (vs. one append per wallet, which at
  *     10⁴ wallets is 10⁴ table scans).
  *
  * Cursor state is a small keyed parquet table next to the sink
  * (`<table>._cursors`: wallet → newest landed signature), read at the
  * START of each round and rewritten after the append commits. As with
  * [[RpcPoller]], cursors are EFFICIENCY state only: a lost or stale
  * cursor table degrades to re-fetching history the keyed append then
  * drops — never to duplicates, never to losses. Writing cursors AFTER
  * the append preserves that invariant under crashes (a round that dies
  * between append and cursor write re-fetches its own batch next round).
  * The cursor table is JOINED, never collected: the wallet-universe ⋈
  * cursor left join, the advancement aggregate, and the anti-join merge
  * all run on executors, so no driver-side per-wallet structure exists
  * at any fleet cardinality (10⁶ wallets is a 10⁶-row relation, not a
  * driver Map).
  *
  * The poller instance itself is STATELESS across rounds (each round
  * re-reads the cursor table), so process restarts and horizontal
  * failover need no recovery protocol: start a new instance on the same
  * table path and poll.
  */
final class RpcFleetPoller(
    ingestor: RpcChainIngestor,
    tablePath: String,
    wallets: Seq[String],
    pageLimit: Int = 1000) {

  require(wallets.nonEmpty, "fleet poller needs at least one wallet")

  private val cursorsPath = s"$tablePath._cursors"

  /** One fleet round: resume-walk every wallet, land the union batch
    * exactly-once, advance the cursors that earned it. Returns rows
    * landed across the whole fleet. A wallet whose feed is down skips
    * loudly (stderr, inside [[RpcChainIngestor.fetchSince]]) and keeps
    * its old cursor, so the next round retries it from the same spot.
    */
  def pollOnce(spark: SparkSession): Long = {
    import spark.implicits._
    pollOnceFleet(spark, spark.createDataset(wallets).toDF("wallet"))
  }

  /** [[pollOnce]] with the wallet universe as a RELATION — the 10⁶+
    * wallet shape: the cursor cut is a left join of the universe against
    * the cursor table, executed on executors; cursor advancement is an
    * aggregate + anti-join merge written back whole. NO step collects a
    * per-wallet map to the driver, so fleet cardinality is bounded only
    * by executor capacity (the round-10 verdict's scale note on
    * loadCursors' driver Map).
    */
  def pollOnceFleet(spark: SparkSession, walletsDf: DataFrame): Long = {
    val cursorsDf = loadCursorsDf(spark)
    val keyed = walletsDf.join(cursorsDf, Seq("wallet"), "left_outer")
    // Eager pin: the batch feeds two consumers (the keyed append and the
    // cursor aggregation); re-evaluating it would re-pay every
    // per-signature network round-trip.
    val batch = ingestor.fetchSinceKeyed(spark, keyed, pageLimit)
      .localCheckpoint(true)
    val n = IdempotentSink.appendOnce(
      spark, batch.drop("_cursor_sig"), tablePath, "id")
    // `_cursor_sig` is constant per wallet (the newest fresh signature),
    // so `first` is deterministic; wallets with no fresh rows this round
    // (idle, dead feed, or every detail fetch skipped) keep their cursor.
    val advanced = batch
      .filter(col("_cursor_sig") =!= "")
      .groupBy(col("wallet_address").as("wallet"))
      .agg(first("_cursor_sig").as("cursor"))
      .localCheckpoint(true) // pin: read for emptiness + twice in the merge
    if (advanced.limit(1).count() > 0)
      saveCursorsDf(spark,
        cursorsDf.join(advanced, Seq("wallet"), "left_anti")
          .unionByName(advanced))
    n
  }

  /** Run `rounds` fleet polls with `intervalMs` sleeps. */
  def run(spark: SparkSession, rounds: Int, intervalMs: Long = 1000L): Long = {
    var landed = 0L
    for (r <- 1 to rounds) {
      landed += pollOnce(spark)
      if (r < rounds && intervalMs > 0) Thread.sleep(intervalMs)
    }
    landed
  }

  /** Current persisted cursor table as a Map — a TEST/observability
    * convenience ONLY (bounded by what the caller is willing to collect);
    * the poll path itself never materializes this.
    */
  def currentCursors(spark: SparkSession): Map[String, String] =
    loadCursorsDf(spark)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** Cursors are efficiency state, so ANY unreadable table — missing
    * (fresh deployment), empty or partial (a writer died mid-swap) —
    * degrades to "bootstrap every wallet", never to a crashed poller:
    * the keyed append dedups whatever the blind round re-fetches.
    * Returned as a RELATION (wallet, cursor); the poll path joins it,
    * never collects it.
    */
  private[sources] def loadCursorsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def empty = Seq.empty[(String, String)].toDF("wallet", "cursor")
    try {
      val df = spark.read.parquet(cursorsPath).select("wallet", "cursor")
      df.queryExecution.analyzed // force schema resolution for the catch
      df
    } catch {
      case e: AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" ||
            e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
        empty
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"Cursor table $cursorsPath unreadable (${e.getMessage}); re-bootstrapping fleet")
        empty
    }
  }

  /** Atomic-swap write (the [[graft.operators.Compactor]] pattern): the
    * merged map lands in a fresh temp dir, then replaces the live table
    * with two renames. A crash leaves either the old table, the new one,
    * or none — never a half-written directory a reader could trust.
    */
  private[sources] def saveCursorsDf(spark: SparkSession, merged: DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(cursorsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      cursorsPath + s".swap-${java.util.UUID.randomUUID}")
    // the tmp write MATERIALIZES the merge (which reads the live table)
    // before any rename touches it; one short row per wallet, so the
    // single output file stays the right unit until fleet size makes it
    // a partitioned write
    merged.select(col("wallet"), col("cursor"))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(
      cursorsPath + s".old-${java.util.UUID.randomUUID}")
    if (fs.exists(p) && !fs.rename(p, old))
      sys.error(s"could not retire old cursor table $p")
    if (!fs.rename(tmp, p)) sys.error(s"could not publish cursor table $p")
    fs.delete(old, true)
  }
}

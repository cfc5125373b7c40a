package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-once-by-key append — the reference's only write-correctness
  * guarantee: `INSERT … ON CONFLICT (id) DO NOTHING`
  * (`/root/reference/adapters/src/repo.rs:26,56`).
  *
  * Batch semantics: dedupe the incoming batch on the key, anti-join against
  * the existing table's keys, append the remainder. Replaying the same batch
  * is a no-op.
  *
  * Scale design: the anti-join probes only the key column of the existing
  * table (column-pruned parquet scan of one string column, not the full
  * table). When the incoming batch is small relative to the table — the
  * normal streaming case — we broadcast the NEW keys and flip the join so
  * the big existing side never shuffles: `existingKeys.join(broadcast(new),
  * "left_semi")` would still scan; instead we broadcast-anti on the new
  * side. At true 100 TB scale the production-grade variant partitions the
  * table by a key bucket so the probe prunes to matching partitions; that
  * layout decision lives with the table writer, this operator honors it via
  * pushdown.
  */
object IdempotentSink {

  /** A second writer held the table's write lock. The reference's
    * `ON CONFLICT DO NOTHING` is concurrency-atomic because Postgres
    * serializes it (`adapters/src/repo.rs:26,56`); check-then-write over
    * plain parquet is not, so a concurrent writer must fail LOUDLY here
    * rather than silently double-insert.
    */
  final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

  private def lockFile(p: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(p, "_graft_write_lock")

  /** Run `body` holding the table's exclusive write lock — a
    * create-exclusive marker file under the table directory (underscore
    * prefix: invisible to parquet readers and to [[Compactor]]'s walks).
    * Atomicity is the filesystem's create-if-absent: genuinely atomic on
    * HDFS-like stores. Raw local / object stores have an
    * exists-then-create race window, hardened by a SETTLE-THEN-FENCE: each
    * writer stamps a unique token, waits `fenceSettleMs` (beyond any
    * realistic create→stamp stall), and reads the lock back — if two
    * writers slipped through the non-atomic create, both read the SAME
    * final content after the settle, so exactly the writer whose stamp
    * survived proceeds and the other throws without touching the (now
    * foreign) lock. The fence is probabilistic, not a proof: a writer
    * stalled longer than the settle between create and stamp can still
    * defeat it, so on stores without atomic create the contract remains
    * best-effort loud failure — deploy one writer per table there.
    *
    * A writer that dies inside `body` leaves the lock behind by design —
    * the next writer fails until an operator inspects the lock's contents
    * (writer id + timestamp) and calls [[breakLock]]; auto-expiry would
    * reintroduce the silent two-writer window for slow writers.
    */
  def withTableLock[T](spark: SparkSession, path: String)(body: => T): T = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val lp = lockFile(p)
    val token = s"pid=${ProcessHandle.current.pid} epochMs=${System.currentTimeMillis} " +
      s"nonce=${java.util.UUID.randomUUID}\n"
    def contention(detail: String) = new ConcurrentWriteException(
      s"table $path is locked by another writer ($detail); " +
        "if that writer is dead, inspect the lock and call breakLock")
    val out =
      try fs.create(lp, /* overwrite = */ false)
      catch {
        // An existing lock is contention — classified by exception TYPE
        // (the Hadoop create contract), not a post-hoc exists() probe that
        // would race the holder's release.
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw contention(s"${lp.getName} exists")
        case e: java.io.IOException =>
          // Secondary, best-effort classification for stores that signal
          // an existing file with a generic IOException; other IO faults
          // (permissions, transient store errors) stay loud and distinct —
          // reporting them as "locked" would send the operator to
          // breakLock, masking the real cause.
          val probed = try fs.exists(lp) catch { case _: java.io.IOException => false }
          if (probed) throw contention(s"${lp.getName} exists") else throw e
      }
    def readLock(): Option[String] = {
      var attempt = 0
      while (attempt < 3) {
        try {
          val in = fs.open(lp)
          try return Some(new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8))
          finally in.close()
        } catch { case _: java.io.IOException => attempt += 1; Thread.sleep(50) }
      }
      None
    }
    // The lock file exists from here on; every exit path below decides
    // explicitly whether we still own it.
    var ownLock = true
    try {
      try { try out.writeBytes(token) finally out.close() }
      catch { case e: Throwable =>
        // Failed stamping the metadata: release the lock so a writer that
        // never entered the critical section doesn't wedge the table — but
        // only if no OTHER writer's stamp landed in the same window
        // (deleting a foreign stamp would unlock a live writer).
        ownLock = false
        if (readLock().forall(s => s.isEmpty || s == token)) fs.delete(lp, false)
        throw e
      }
      Thread.sleep(fenceSettleMs) // settle: let any racing stamp land
      readLock() match {
        case Some(`token`) => // verified sole owner
        case Some(seen) =>
          ownLock = false
          throw contention(s"lost the create race; lock now held by: ${seen.trim}")
        case None =>
          // Can't VERIFY ownership (persistent read fault): neither proceed
          // (risks two writers) nor delete (risks removing a live writer's
          // lock). Distinct error, not contention — the operator needs to
          // look at the store, not hunt a phantom writer.
          ownLock = false
          throw new java.io.IOException(
            s"could not verify write-lock ownership for $path after stamping; " +
              s"inspect $lp and call breakLock if no writer is alive")
      }
      body
    } finally if (ownLock) fs.delete(lp, false)
  }

  /** Settle window for the token fence — longer than any realistic
    * create→stamp stall; var so tests covering the fence can shrink it.
    */
  private[operators] var fenceSettleMs: Long = 100L

  /** Forcibly remove a dead writer's lock. Returns true if a lock was
    * present. Operator action — never call on a table with a live writer.
    */
  def breakLock(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(lockFile(p), false)
  }

  /** Append `batch` to the parquet table at `path`, skipping rows whose
    * `keyCol` already exists. Creates the table on first write.
    * `partitionCols` selects a hive-partitioned layout (e.g. a wallet hash
    * bucket) so keyed reads prune to matching directories.
    * Returns the number of rows actually appended.
    *
    * Concurrency contract: the whole check-then-write runs under
    * [[withTableLock]], so a second concurrent writer throws
    * [[ConcurrentWriteException]] instead of racing the existence check
    * and double-inserting — the loud-failure analogue of the reference's
    * serialized `ON CONFLICT DO NOTHING`. Retrying the failed batch after
    * the winner's append is safe by idempotence.
    */
  def appendOnce(spark: SparkSession, batch: DataFrame, path: String, keyCol: String,
      partitionCols: Seq[String] = Nil): Long = withTableLock(spark, path) {
    // Checkpoint, not persist(): the anti-join reads the same table this
    // method appends to. A plain persist() keeps the lineage alive, so an
    // evicted/lost cached partition recomputed AFTER the append commits
    // would re-run the anti-join against the mutated table and drop rows
    // mid-write. Checkpointing severs that lineage — a lost block fails the
    // job loudly instead of corrupting the output.
    //
    // The checkpoint is taken on an RDD we hold directly (not via
    // Dataset.localCheckpoint, which hides its checkpointed RDD inside a
    // LogicalRDD that Dataset.unpersist can't reach — the CacheManager has
    // no entry for it, so the blocks would linger until ContextCleaner GC).
    // Holding the handle makes the finally-block release real: a long
    // ingest loop drops each batch's blocks as soon as its append lands.
    //
    // The RDD stays in InternalRow (Tungsten binary) form via
    // GraftInternalBridge — `df.rdd` would deserialize every field to boxed
    // external Rows and re-encode them on both the count and the write.
    // toRdd's iterators reuse mutable UnsafeRow buffers: copy before
    // persisting (same rule Dataset.localCheckpoint applies internally).
    val plan = dedupeAgainstExisting(spark, batch, path, keyCol)
    val rdd = plan.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val fresh = org.apache.spark.sql.GraftInternalBridge
      .fromInternalRdd(spark, rdd, plan.schema)
    try {
      val n = fresh.count() // materializes the checkpoint
      if (n > 0) {
        val w = fresh.write.mode(SaveMode.Append)
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
      }
      n
    } finally rdd.unpersist(blocking = false)
  }

  /** The pure (side-effect-free) core: batch rows whose key is not already
    * present at `path`, with in-batch duplicates collapsed.
    */
  def dedupeAgainstExisting(
      spark: SparkSession, batch: DataFrame, path: String, keyCol: String): DataFrame = {
    val deduped = batch.dropDuplicates(keyCol)
    if (!tableExists(spark, path)) deduped
    else {
      val existingKeys = spark.read.parquet(path).select(col(keyCol))
      // New batches are typically tiny vs the table: broadcast the batch
      // keys so the existing-keys scan never shuffles.
      val dupKeys = existingKeys
        .join(broadcast(deduped.select(col(keyCol))), Seq(keyCol), "left_semi")
      deduped.join(dupKeys, Seq(keyCol), "left_anti")
    }
  }

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // "exists" means HAS DATA: lock acquisition mkdirs the table directory
    // before the first write, so a bare/hidden-only dir (lock marker,
    // _SUCCESS) must still read as a fresh table or the first append would
    // try to schema-infer an empty parquet dir and fail. A directory with
    // '=' in its name is a hive partition dir and always counts as data —
    // even when the partition COLUMN starts with '_' (the `_bucket=N`
    // layout), which the plain hidden-prefix rule would wrongly skip.
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      (s.isDirectory && n.contains("=")) ||
        (!n.startsWith("_") && !n.startsWith("."))
    }
  }
}

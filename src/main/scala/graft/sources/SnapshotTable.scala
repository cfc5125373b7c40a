package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s.{JArray, JDouble, JInt, JObject, JString, JValue}
import org.json4s.jackson.JsonMethods

/** Transaction-log table format: ACID appends/overwrites, snapshot-isolated
  * reads, and time travel over plain parquet — the lakehouse mechanism the
  * public Delta/Iceberg designs share, re-derived from first principles
  * (optimistic concurrency via atomic log-entry creation; the reference's
  * history tables at `/root/reference/adapters/src/repo.rs` get insert-only
  * idempotence from Postgres — this is the object-store analogue a 100 TB
  * deployment actually runs on).
  *
  * Layout under the table root:
  * {{{
  *   _graft_log/v0000000001.json            one commit (op, add, remove, schema)
  *   _graft_log/v0000000010.checkpoint.json full active-file list at that version
  *   data/<commit-uuid>/part-*.parquet      immutable data files
  * }}}
  *
  * Commit protocol (writer side):
  *  1. Stage the batch's parquet files under a fresh `data/<uuid>/` dir —
  *     data staging is conflict-free because the dir name is unique.
  *  2. Compute the log action against the CURRENT snapshot, then claim the
  *     next version number by CREATING `v<n>.json` exclusively (O_EXCL on
  *     local FS, `create(overwrite=false)` elsewhere — the same atomicity
  *     analysis as [[graft.operators.IdempotentSink.withTableLock]]). A
  *     loser re-reads the log and retries with the next number, so
  *     concurrent appends serialize without any lock and an overwrite
  *     racing an append recomputes its remove-set before re-claiming.
  *  3. Every [[checkpointInterval]] commits, write a checkpoint holding the
  *     full active-file list — readers replay O(interval) tail entries
  *     instead of the whole history, which is what keeps snapshot
  *     resolution O(1) when the log reaches millions of commits.
  *
  * Reader side: snapshot resolution lists `_graft_log` ONCE, picks the
  * newest checkpoint ≤ the requested version, replays the tail, and hands
  * the file list to the parquet reader — reads never see a half-committed
  * batch because files only become visible through a log entry that was
  * created atomically (snapshot isolation). Data files are immutable;
  * overwrites retire them logically, and [[vacuum]] deletes files
  * unreferenced by every retained snapshot.
  *
  * Scale: the log carries FILE PATHS (bytes ∝ files, not rows); commits
  * are one filesystem create regardless of batch size; reads plan from the
  * file list without directory scans of `data/`. Column stats / data
  * skipping would ride the same entries (parquet footers already give
  * row-group pruning once files are opened).
  */
object SnapshotTable {

  /** Commits between checkpoints — small enough that tail replay is a few
    * file reads, large enough that checkpoint writes stay rare.
    */
  val checkpointInterval = 10

  /** Raced another writer for too many consecutive version claims. */
  final class CommitContentionException(msg: String) extends RuntimeException(msg)

  /** A resolved snapshot: the table state some reader plans against.
    * `txns` carries the highest committed batch id per streaming writer —
    * the exactly-once mechanism of [[commitStreamBatch]]; `stats` the
    * per-file per-column (min, max) of the writer-declared stat columns —
    * the file-skipping index of [[readPruned]].
    */
  final case class Snapshot(version: Int, schemaJson: String, files: Seq[String],
      txns: Map[String, Long] = Map.empty,
      stats: Map[String, Map[String, (Double, Double)]] = Map.empty)

  private val LogDir = "_graft_log"
  private def logName(v: Int) = f"v$v%010d.json"
  private def checkpointName(v: Int) = f"v$v%010d.checkpoint.json"

  private def fsFor(spark: SparkSession, table: String): (FileSystem, Path) = {
    val p = new Path(table)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Append `df` as a new commit; returns the committed version (1-based).
    * `statsCols` names numeric columns whose per-file min/max land in the
    * commit entry for [[readPruned]]'s file skipping — combine with a
    * Z-ordered layout ([[commitZOrdered]]) to make the ranges narrow in
    * EVERY listed dimension.
    */
  def commitAppend(spark: SparkSession, table: String, df: DataFrame,
      statsCols: Seq[String] = Nil): Int =
    commit(spark, table, df, overwrite = false, statsCols = statsCols)

  /** Append `df` clustered along the (c1, c2, …) Z-order curve into
    * `nFiles` range-partitioned files, with per-file stats on every curve
    * column — multi-dimensional data skipping: because the curve keeps
    * files narrow in ALL listed dimensions at once, a predicate on ANY of
    * them prunes most files (a single-column sort is narrow in one).
    * `bounds` are (col, min, max) — pass precomputed corpus bounds so the
    * curve normalization is one bounded driver value, not a second scan
    * here.
    */
  def commitZOrdered(spark: SparkSession, table: String, df: DataFrame,
      bounds: Seq[(String, Long, Long)], nFiles: Int): Int = {
    import org.apache.spark.sql.functions.col
    val z = graft.operators.ZOrder.curve(
      bounds.map { case (c, lo, hi) => (col(c), lo, hi) })
    val clustered = df.withColumn("_graft_z", z)
      .repartitionByRange(nFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
    commit(spark, table, clustered, overwrite = false,
      statsCols = bounds.map(_._1))
  }

  /** Replace the table's full content with `df`; prior versions stay
    * time-travel-readable until [[vacuum]].
    */
  def commitOverwrite(spark: SparkSession, table: String, df: DataFrame): Int =
    commit(spark, table, df, overwrite = true)

  /** EXACTLY-ONCE streaming append — the foreachBatch sink contract. A
    * micro-batch replayed after a failure (same `appId`, same `batchId`)
    * finds its transaction already recorded in the snapshot and becomes a
    * no-op, so the sink is idempotent under Structured Streaming's
    * at-least-once batch redelivery: at-least-once delivery + transaction
    * dedup in the atomically-created log entry = exactly-once table
    * content (the public Delta sink's `txn` action, re-derived). Returns
    * the committed version, or the current version when skipped.
    *
    * The skip check and the claim race are resolved by the SAME log
    * create: a concurrent duplicate writer (zombie executor replaying an
    * old epoch) loses the version claim, re-resolves, sees the txn, and
    * skips — there is no window in which the batch can land twice.
    */
  def commitStreamBatch(spark: SparkSession, table: String, df: DataFrame,
      appId: String, batchId: Long): Int = {
    val already = resolve(spark, table, None)
      .exists(_.txns.get(appId).exists(_ >= batchId))
    if (already) currentVersion(spark, table)
    else commit(spark, table, df, overwrite = false, txn = Some(appId -> batchId))
  }

  private def commit(spark: SparkSession, table: String, df: DataFrame,
      overwrite: Boolean, txn: Option[(String, Long)] = None,
      statsCols: Seq[String] = Nil): Int = {
    val (fs, root) = fsFor(spark, table)
    fs.mkdirs(new Path(root, LogDir))
    // 1. conflict-free data staging
    val stage = s"data/${java.util.UUID.randomUUID}"
    df.write.parquet(new Path(root, stage).toString)
    val added = fs.listStatus(new Path(root, stage)).toSeq
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .sorted
      .map(n => s"$stage/$n")
    // per-file column stats for data skipping: ONE grouped aggregate over
    // the freshly staged bytes covering every stat column (cost ∝ batch,
    // never ∝ table) — the lakehouse file-skipping index, carried in the
    // log entry itself
    val stats: Map[String, Map[String, (Double, Double)]] =
      if (statsCols.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.functions.{col, input_file_name, max, min}
        val aggs = statsCols.flatMap(c => Seq(
          min(col(c).cast("double")).as(s"lo_$c"),
          max(col(c).cast("double")).as(s"hi_$c")))
        spark.read.parquet(new Path(root, stage).toString)
          .groupBy(input_file_name().as("f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val file = s"$stage/${r.getString(0).split('/').last}"
            file -> statsCols.map(c =>
              c -> (r.getAs[Double](s"lo_$c"), r.getAs[Double](s"hi_$c"))).toMap
          }
          .toMap
      }
    val schemaJson = df.schema.json
    // 2. optimistic version claim; remove-set recomputed per attempt so an
    //    overwrite losing a race retires the files of the snapshot it
    //    actually supersedes.
    var attempt = 0
    while (attempt < 64) {
      val cur = resolve(spark, table, None)
      // a duplicate streaming batch detected AFTER losing a claim race:
      // the winner (or an earlier attempt) already recorded this txn
      txn.foreach { case (app, id) =>
        if (cur.exists(_.txns.get(app).exists(_ >= id)))
          return cur.get.version
      }
      val next = cur.map(_.version).getOrElse(0) + 1
      val removed = if (overwrite) cur.map(_.files).getOrElse(Nil) else Nil
      val txnFields: List[(String, JValue)] = txn.toList.flatMap { case (app, id) =>
        List("txnApp" -> JString(app), "txnId" -> JInt(id))
      }
      val statFields: List[(String, JValue)] =
        if (stats.isEmpty) Nil else List("stats" -> statsJson(stats))
      val entry = JsonMethods.compact(JsonMethods.render(JObject(
        List[(String, JValue)](
          "version" -> JInt(next),
          "op" -> JString(if (overwrite) "overwrite" else "append"),
          "schema" -> JString(schemaJson),
          "add" -> JArray(added.map(JString(_)).toList),
          "remove" -> JArray(removed.map(JString(_)).toList)) ++ txnFields ++ statFields)))
      if (createExclusive(fs, new Path(new Path(root, LogDir), logName(next)), entry)) {
        if (next % checkpointInterval == 0) {
          // best-effort: a lost checkpoint only costs replay length
          val files = (cur.map(_.files).getOrElse(Nil).filterNot(removed.toSet) ++ added)
          val txns = cur.map(_.txns).getOrElse(Map.empty) ++ txn.toMap
          val cpStats =
            cur.map(_.stats).getOrElse(Map.empty) -- removed ++ stats
          val cp = JsonMethods.compact(JsonMethods.render(JObject(
            "version" -> JInt(next),
            "schema" -> JString(schemaJson),
            "txns" -> JObject(txns.toList.map { case (k, v) => k -> (JInt(v): JValue) }),
            "stats" -> statsJson(cpStats),
            "files" -> JArray(files.map(JString(_)).toList))))
          val out = fs.create(new Path(new Path(root, LogDir), checkpointName(next)), true)
          try out.write(cp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
        return next
      }
      attempt += 1
    }
    throw new CommitContentionException(
      s"lost 64 consecutive version-claim races on $table; aborting commit " +
        s"(staged files under $stage are unreferenced and vacuum-able)")
  }

  /** Atomic create-or-fail — same per-scheme analysis as IdempotentSink:
    * local FS takes the NIO O_EXCL path (create+payload in one syscall-
    * backed op), HDFS-like stores get exclusivity from the namenode create.
    */
  private def createExclusive(fs: FileSystem, p: Path, body: String): Boolean = {
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (fs.getUri.getScheme == "file") {
      try { java.nio.file.Files.write(java.nio.file.Paths.get(p.toUri.getPath), bytes,
        java.nio.file.StandardOpenOption.CREATE_NEW); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      val out =
        try fs.create(p, /* overwrite = */ false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
          case e: java.io.IOException =>
            if (try fs.exists(p) catch { case _: java.io.IOException => false }) return false
            else throw e
        }
      try out.write(bytes) finally out.close()
      true
    }
  }

  /** The table's current committed version; 0 = never committed. */
  def currentVersion(spark: SparkSession, table: String): Int =
    resolve(spark, table, None).map(_.version).getOrElse(0)

  /** Resolve the snapshot at `asOf` (None = latest): one log listing, the
    * newest usable checkpoint, then tail replay.
    */
  def snapshot(spark: SparkSession, table: String, asOf: Option[Int] = None): Snapshot =
    resolve(spark, table, asOf).getOrElse(
      throw new IllegalArgumentException(
        asOf.fold(s"$table has no commits")(v => s"$table has no commits at or before version $v")))

  private def resolve(spark: SparkSession, table: String,
      asOf: Option[Int]): Option[Snapshot] = {
    val (fs, root) = fsFor(spark, table)
    val logDir = new Path(root, LogDir)
    if (!fs.exists(logDir)) return None
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    val commits = names.collect {
      case n if n.endsWith(".json") && !n.endsWith(".checkpoint.json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt -> n
    }.filter { case (v, _) => asOf.forall(v <= _) }.sortBy(_._1)
    if (commits.isEmpty) return None
    val target = commits.last._1
    val cpVersion = names.collect {
      case n if n.endsWith(".checkpoint.json") =>
        n.stripPrefix("v").stripSuffix(".checkpoint.json").toInt
    }.filter(_ <= target).sorted.lastOption
    var files = Vector.empty[String]
    var schema = ""
    var txns = Map.empty[String, Long]
    var stats = Map.empty[String, Map[String, (Double, Double)]]
    cpVersion.foreach { v =>
      val j = readJson(fs, new Path(logDir, checkpointName(v)))
      files = arr(j, "files").toVector
      schema = str(j, "schema")
      txns = j \ "txns" match {
        case JObject(fields) => fields.collect { case (k, JInt(v)) => k -> v.toLong }.toMap
        case _ => Map.empty
      }
      stats = statsOf(j)
    }
    commits.collect { case (v, n) if v > cpVersion.getOrElse(0) => (v, n) }.foreach {
      case (_, n) =>
        val j = readJson(fs, new Path(logDir, n))
        val rm = arr(j, "remove").toSet
        files = files.filterNot(rm) ++ arr(j, "add")
        schema = str(j, "schema")
        (j \ "txnApp", j \ "txnId") match {
          case (JString(app), JInt(id)) => txns += app -> id.toLong
          case _ =>
        }
        stats = stats -- rm ++ statsOf(j)
    }
    Some(Snapshot(target, schema, files, txns, stats))
  }

  private def statsJson(stats: Map[String, Map[String, (Double, Double)]]): JObject =
    JObject(stats.toList.map { case (f, cols) =>
      f -> (JObject(cols.toList.map { case (c, (lo, hi)) =>
        c -> (JArray(List(JDouble(lo), JDouble(hi))): JValue)
      }): JValue)
    })

  private def statsOf(j: JValue): Map[String, Map[String, (Double, Double)]] =
    j \ "stats" match {
      case JObject(fields) => fields.collect {
        case (f, JObject(cols)) =>
          f -> cols.collect {
            case (c, JArray(List(lo, hi))) => c -> (numOf(lo), numOf(hi))
          }.toMap
      }.toMap
      case _ => Map.empty
    }
  private def numOf(j: JValue): Double = j match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case _ => Double.NaN
  }

  private def readJson(fs: FileSystem, p: Path): JValue = {
    val in = fs.open(p)
    try JsonMethods.parse(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
  private def arr(j: JValue, f: String): Seq[String] = j \ f match {
    case JArray(xs) => xs.collect { case JString(s) => s }
    case _ => Nil
  }
  private def str(j: JValue, f: String): String = j \ f match {
    case JString(s) => s
    case _ => ""
  }

  /** Snapshot-isolated read; `versionAsOf` time-travels. An empty active
    * set (overwrite-with-nothing) still returns the committed schema.
    */
  def read(spark: SparkSession, table: String, versionAsOf: Option[Int] = None): DataFrame = {
    val snap = snapshot(spark, table, versionAsOf)
    val (_, root) = fsFor(spark, table)
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        DataType.fromJson(snap.schemaJson).asInstanceOf[StructType])
    else spark.read.parquet(snap.files.map(f => new Path(root, f).toString): _*)
  }

  /** ZERO-COPY shallow clone: `dst` becomes a new table whose first
    * commit REFERENCES the source snapshot's data files (absolute paths —
    * `Path(root, child)` resolution keeps absolute children as-is), with
    * schema and file stats carried over. No data bytes move: at 100 TB a
    * clone is one log write, which is what makes dev/test forks and
    * experiment branches of a production table free. The clone then
    * evolves independently (its own appends/overwrites/vacuum).
    *
    * Contract (same as the public Delta design's shallow clone): the
    * clone depends on the SOURCE's files — vacuuming the source beyond
    * the cloned version breaks the clone loudly at read time; deep-copy
    * with `commitAppend(read(src))` when the source's retention cannot
    * be trusted. Returns the clone's version (1).
    */
  def cloneShallow(spark: SparkSession, src: String, dst: String,
      versionAsOf: Option[Int] = None): Int = {
    val snap = snapshot(spark, src, versionAsOf)
    val (_, srcRoot) = fsFor(spark, src)
    val (fs, dstRoot) = fsFor(spark, dst)
    fs.mkdirs(new Path(dstRoot, LogDir))
    def absolute(f: String) =
      new Path(srcRoot, f).toUri.toString
    val entry = JsonMethods.compact(JsonMethods.render(JObject(
      List[(String, JValue)](
        "version" -> JInt(1),
        "op" -> JString("clone"),
        "schema" -> JString(snap.schemaJson),
        "add" -> JArray(snap.files.map(f => JString(absolute(f))).toList),
        "remove" -> JArray(Nil),
        "stats" -> statsJson(snap.stats.map { case (f, cols) => absolute(f) -> cols })))))
    if (!createExclusive(fs, new Path(new Path(dstRoot, LogDir), logName(1)), entry))
      throw new IllegalArgumentException(s"$dst already has commits; clone needs a fresh table")
    1
  }

  /** The file-skipping plan for conjunctive `[lo, hi]` range predicates
    * on stat columns: (files to read, total active files). A file is
    * SKIPPED only when some predicate's recorded (min, max) provably
    * misses its range; files or columns committed without stats always
    * read (pruning is conservative — correctness never depends on it).
    */
  def planPruned(spark: SparkSession, table: String,
      ranges: Seq[(String, Double, Double)],
      versionAsOf: Option[Int] = None): (Seq[String], Int) = {
    val snap = snapshot(spark, table, versionAsOf)
    val keep = snap.files.filter { f =>
      val cols = snap.stats.getOrElse(f, Map.empty)
      ranges.forall { case (c, lo, hi) =>
        cols.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
    }
    (keep, snap.files.size)
  }

  /** Snapshot read restricted to files that can hold stat-column values
    * inside every `[lo, hi]` range — the caller still applies its actual
    * row predicate; skipping only removes whole files the log's stats
    * prove irrelevant (at 100 TB this is the difference between scanning
    * a day and scanning the table). Empty plan → empty frame with the
    * schema.
    */
  def readPruned(spark: SparkSession, table: String,
      ranges: Seq[(String, Double, Double)],
      versionAsOf: Option[Int] = None): DataFrame = {
    val (keep, _) = planPruned(spark, table, ranges, versionAsOf)
    val snap = snapshot(spark, table, versionAsOf)
    val (_, root) = fsFor(spark, table)
    if (keep.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        DataType.fromJson(snap.schemaJson).asInstanceOf[StructType])
    else spark.read.parquet(keep.map(f => new Path(root, f).toString): _*)
  }

  /** CHANGE DATA FEED: every row-level change in versions
    * `(fromVersion, toVersion]`, tagged `_change_type`
    * ('insert'|'delete') and `_commit_version` — the downstream-sync
    * surface (incremental ETL, streaming CDC out of the table). Appends
    * emit inserts; overwrites emit deletes for every retired file's rows
    * plus inserts for the new content. Requires the per-version log
    * entries (loud error if vacuumed/checkpoint-trimmed away) and the
    * retired data files (pre-vacuum).
    */
  def changes(spark: SparkSession, table: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(fromVersion < toVersion,
      s"empty change range ($fromVersion, $toVersion]")
    val (fs, root) = fsFor(spark, table)
    val logDir = new Path(root, LogDir)
    def abs(f: String) = new Path(root, f).toString
    val parts = ((fromVersion + 1) to toVersion).flatMap { v =>
      val p = new Path(logDir, logName(v))
      if (!fs.exists(p)) throw new IllegalArgumentException(
        s"$table has no log entry for version $v (vacuumed or checkpoint-trimmed); " +
          "change feed is only available for retained versions")
      val j = readJson(fs, p)
      val add = arr(j, "add"); val rm = arr(j, "remove")
      val del = if (rm.nonEmpty)
        Seq(spark.read.parquet(rm.map(abs): _*)
          .withColumn("_change_type", lit("delete"))
          .withColumn("_commit_version", lit(v)))
      else Nil
      val ins = if (add.nonEmpty)
        Seq(spark.read.parquet(add.map(abs): _*)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(v)))
      else Nil
      del ++ ins
    }
    require(parts.nonEmpty, s"no changes recorded in ($fromVersion, $toVersion]")
    parts.reduce(_ unionByName _)
  }

  /** Delete log entries the newest checkpoint has already absorbed,
    * keeping `retainVersions` of tail history (time travel + change feed
    * stay available inside the horizon). This is what keeps the log
    * LISTING bounded at millions of commits: resolution is already
    * O(checkpoint tail) via checkpoints, but the directory itself only
    * stays small if absorbed entries are retired. Returns entries deleted.
    */
  def cleanupLog(spark: SparkSession, table: String, retainVersions: Int): Int = {
    val (fs, root) = fsFor(spark, table)
    val logDir = new Path(root, LogDir)
    if (!fs.exists(logDir)) return 0
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    val cpVersions = names.collect {
      case n if n.endsWith(".checkpoint.json") =>
        n.stripPrefix("v").stripSuffix(".checkpoint.json").toInt
    }
    if (cpVersions.isEmpty) return 0 // nothing absorbed yet — keep all
    val cur = currentVersion(spark, table)
    // always retain the newest entry (resolution anchors on commit
    // entries; a checkpoint alone cannot define the current version)
    val horizon = math.min(cpVersions.max, cur - math.max(1, retainVersions))
    var removed = 0
    names.foreach { n =>
      if (n.endsWith(".json") && !n.endsWith(".checkpoint.json")) {
        val v = n.stripPrefix("v").stripSuffix(".json").toInt
        // an entry is deletable only when BOTH absorbed by a checkpoint
        // (some checkpoint version ≥ v exists) and outside the horizon
        if (v <= horizon && cpVersions.exists(_ >= v)) {
          fs.delete(new Path(logDir, n), false); removed += 1
        }
      }
    }
    removed
  }

  /** Delete data files unreferenced by every snapshot newer than
    * `retainVersions` back from current (older versions stop being
    * time-travel-readable). Returns the number of files deleted.
    */
  def vacuum(spark: SparkSession, table: String, retainVersions: Int): Int = {
    val (fs, root) = fsFor(spark, table)
    val cur = currentVersion(spark, table)
    val horizon = math.max(1, cur - retainVersions)
    val live = (horizon to cur)
      .flatMap(v => resolve(spark, table, Some(v)).map(_.files).getOrElse(Nil)).toSet
    val dataDir = new Path(root, "data")
    if (!fs.exists(dataDir)) return 0
    var removed = 0
    fs.listStatus(dataDir).foreach { stageDir =>
      fs.listStatus(stageDir.getPath).foreach { f =>
        val rel = s"data/${stageDir.getPath.getName}/${f.getPath.getName}"
        val visible = !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")
        if (visible && !live.contains(rel)) { fs.delete(f.getPath, false); removed += 1 }
      }
      if (fs.listStatus(stageDir.getPath).isEmpty) fs.delete(stageDir.getPath, true)
    }
    removed
  }
}

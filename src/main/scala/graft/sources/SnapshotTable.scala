package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s.{JArray, JBool, JDouble, JInt, JObject, JString, JValue}
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

  /** An append whose schema is incompatible with the table's (schema
    * enforcement — the Delta contract: a typo'd producer must fail loudly
    * at WRITE time, not poison every future read).
    */
  final class SchemaMismatchException(msg: String) extends IllegalArgumentException(msg)

  /** Lossless numeric widenings an evolving append may apply to a table
    * column (the public Delta type-widening set's integer/float core).
    * Anything else — narrowing, string↔numeric, nested restructuring —
    * is a rejection even under `mergeSchema`.
    */
  private def widens(from: DataType, to: DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType)            => true
      case (IntegerType, LongType)                        => true
      case (FloatType, DoubleType)                        => true
      case _                                              => false
    }
  }

  /** Schema-on-write enforcement + opt-in evolution. Returns the schema to
    * RECORD for the commit (the table's schema, possibly evolved).
    *
    * Default (`mergeSchema = false`) — enforcement:
    *  - every incoming column must exist in the table with the EXACT type;
    *  - an incoming nullable column may not land in a non-null table column;
    *  - incoming may omit table columns only if they are nullable (reads
    *    fill them with null via the recorded snapshot schema);
    *  - any extra incoming column is a rejection.
    *
    * `mergeSchema = true` — evolution, recorded in the commit entry:
    *  - new incoming columns append to the schema as nullable;
    *  - a lossless numeric widening ([[widens]]) widens the table column;
    *  - incoming nullability widens the table column to nullable;
    *  - everything else still rejects (narrowing a column or changing its
    *    type class silently is how lakes rot).
    *
    * A non-null table column missing from the batch rejects in BOTH modes —
    * nothing can backfill it.
    */
  private[sources] def evolveSchema(table: StructType, incoming: StructType,
      mergeSchema: Boolean): StructType = {
    val tByName = table.fields.map(f => f.name -> f).toMap
    def fail(msg: String) = throw new SchemaMismatchException(
      s"$msg (table: ${table.simpleString}, batch: ${incoming.simpleString}" +
        (if (mergeSchema) ", mergeSchema=true)" else "; pass mergeSchema=true to evolve)"))
    incoming.fields.foreach { f =>
      tByName.get(f.name) match {
        case Some(t) =>
          if (f.dataType != t.dataType &&
              !(mergeSchema && widens(t.dataType, f.dataType)) &&
              // an incoming NARROWER value is always storable in the wider
              // table column's reads (int file read as long) — accept it
              // without evolving anything
              !widens(f.dataType, t.dataType))
            fail(s"column ${f.name}: batch type ${f.dataType.simpleString} " +
              s"incompatible with table type ${t.dataType.simpleString}")
          if (f.nullable && !t.nullable && !mergeSchema)
            fail(s"column ${f.name}: nullable batch data cannot land in a non-null column")
        case None =>
          if (!mergeSchema) fail(s"column ${f.name} does not exist in the table")
      }
    }
    table.fields.foreach { t =>
      if (!incoming.fieldNames.contains(t.name) && !t.nullable)
        fail(s"non-null column ${t.name} missing from the batch")
    }
    if (!mergeSchema) table
    else {
      val iByName = incoming.fields.map(f => f.name -> f).toMap
      val widened = table.fields.map { t =>
        iByName.get(t.name) match {
          case Some(i) if i.dataType != t.dataType && widens(t.dataType, i.dataType) =>
            t.copy(dataType = i.dataType, nullable = t.nullable || i.nullable)
          case Some(i) => t.copy(nullable = t.nullable || i.nullable)
          case None    => t
        }
      }
      val added = incoming.fields.filterNot(f => tByName.contains(f.name))
        .map(_.copy(nullable = true))
      StructType(widened ++ added)
    }
  }

  /** A resolved snapshot: the table state some reader plans against.
    * `txns` carries the highest committed batch id per streaming writer —
    * the exactly-once mechanism of [[commitStreamBatch]]; `stats` the
    * per-file per-column (min, max) of the writer-declared stat columns —
    * the file-skipping index of [[readPruned]].
    */
  final case class Snapshot(version: Int, schemaJson: String, files: Seq[String],
      txns: Map[String, Long] = Map.empty,
      stats: Map[String, Map[String, (Double, Double)]] = Map.empty,
      constraints: Map[String, String] = Map.empty,
      dvs: Map[String, Seq[String]] = Map.empty)

  private val LogDir = "_graft_log"
  private def logName(v: Int) = f"v$v%010d.json"

  /** `_last_checkpoint` pointer file (the public Delta design): names the
    * newest checkpoint so LATEST-snapshot resolution never lists the log
    * dir (the only depth-linear term — see [[resolve]]'s fast path).
    * Written best-effort after every checkpoint; readers treat a stale,
    * corrupt, or missing pointer as "use the listing path", so the
    * non-atomic overwrite is safe on every store.
    */
  private val LastCheckpoint = "_last_checkpoint"
  private def checkpointName(v: Int) = f"v$v%010d.checkpoint.json"
  // STRICT name patterns: a foreign file in _graft_log (editor temp file,
  // checkpoint .tmp, stray artifact) must be ignored, not crash every read
  // with a NumberFormatException from a blind stripPrefix().toInt.
  private val CommitRe = """^v(\d{10})\.json$""".r
  private val CheckpointRe = """^v(\d{10})\.checkpoint\.json$""".r

  private def fsFor(spark: SparkSession, table: String): (FileSystem, Path) = {
    val p = new Path(table)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Append `df` as a new commit; returns the committed version (1-based).
    * `statsCols` names numeric columns whose per-file min/max land in the
    * commit entry for [[readPruned]]'s file skipping — combine with a
    * Z-ordered layout ([[commitZOrdered]]) to make the ranges narrow in
    * EVERY listed dimension.
    *
    * Schema-on-write: the batch schema is checked against the table's
    * ([[evolveSchema]]) — incompatible appends throw
    * [[SchemaMismatchException]]; `mergeSchema = true` opts into recorded
    * evolution (new nullable columns, lossless numeric widening).
    * An OVERWRITE replaces the schema outright (its content replaces the
    * table, so there is nothing to be compatible with).
    */
  def commitAppend(spark: SparkSession, table: String, df: DataFrame,
      statsCols: Seq[String] = Nil, mergeSchema: Boolean = false): Int =
    commit(spark, table, df, overwrite = false, statsCols = statsCols,
      mergeSchema = mergeSchema)

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

  /** A rewrite (optimize/merge) lost to a concurrent commit that retired
    * files it was rewriting — retrying would resurrect superseded rows, so
    * the rewrite aborts instead (its staged files are vacuum-able).
    */
  final class ConcurrentRewriteException(msg: String) extends RuntimeException(msg)

  /** Log-native OPTIMIZE: bin-pack the snapshot's small files (<
    * `targetBytes`) into ~`targetBytes` outputs as ONE remove+add commit —
    * the maintenance third of the lakehouse triple (streaming ingest
    * leaves a file per trigger; scan cost grows with file COUNT, not
    * bytes). Readers are never disturbed: pre-optimize snapshots still
    * reference the old files (time travel intact until [[vacuum]]), and
    * the swap is as atomic as any commit. Stats are RECOMPUTED for the
    * rewritten files over the same stat columns the snapshot tracks, so
    * data skipping survives compaction. [[changes]] emits NOTHING for an
    * optimize version — the table content is identical by construction.
    * Returns the committed version (or the current one when <2 small
    * files exist — nothing to pack). Concurrent appends are compatible
    * (their files are untouched); a concurrent overwrite/merge that
    * retires a file being rewritten aborts this optimize loudly
    * ([[ConcurrentRewriteException]]).
    */
  def optimizeCompact(spark: SparkSession, table: String,
      targetBytes: Long = 128L << 20): Int = {
    val (fs, root) = fsFor(spark, table)
    val resolved = resolve(spark, table, None)
    if (resolved.isEmpty) return 0 // nothing committed: maintenance no-op
    val snap = resolved.get
    val sized = snap.files.map(f => f -> fs.getFileStatus(new Path(root, f)).getLen)
    // DV-carrying files are ALWAYS candidates regardless of size: the
    // rewrite MATERIALIZES their deletion vectors away (OPTIMIZE purges
    // DVs — the merge-on-read debt is repaid here)
    val small = sized.filter { case (f, len) =>
      len < targetBytes || snap.dvs.contains(f) }
    if (small.size < 2 && !small.exists(f => snap.dvs.contains(f._1)))
      return snap.version
    val nOut = math.max(1, math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    // coalesce, never repartition: bin-packing is a NARROWING of existing
    // partitions — no shuffle, rows stream file→file
    val content = liveRows(spark, snap, root, small.map(_._1))
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      .coalesce(nOut)
    val statsCols = snap.stats.values.flatMap(_.keys).toSeq.distinct
    val (_, added, stats) = stageData(spark, fs, root, content, statsCols)
    commitRewrite(spark, table, small.map(_._1), added, stats,
      snap.schemaJson, op = "optimize")
  }

  /** Keyed MERGE (C7 upsert semantics on the log table): `source` rows
    * UPDATE the table rows sharing their `keyCols` and INSERT where no
    * match exists, as one remove+add commit that rewrites ONLY the files
    * containing matched keys (cost ∝ touched files, never ∝ table — the
    * copy-on-write MERGE of the public Delta design). The commit records
    * `mergeKey`, which lets [[changes]] emit the full public CDF surface
    * for the version: `update_preimage`/`update_postimage` for rows whose
    * content changed, `insert` for new keys — rewritten-but-identical
    * rows (copied neighbors in a touched file, or a no-op update) emit
    * nothing.
    *
    * Contract: `keyCols` must be unique in BOTH the table and `source`
    * (the upsert ambiguity rule every MERGE shares); `source` must pass
    * the table's schema enforcement, with missing nullable columns
    * filled as null. Returns the committed version.
    */
  def commitMerge(spark: SparkSession, table: String, source: DataFrame,
      keyCols: Seq[String]): Int = {
    import org.apache.spark.sql.functions.{col, input_file_name, lit}
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val cur = resolve(spark, table, None)
    if (cur.isEmpty) return commit(spark, table, source, overwrite = false)
    val snap = cur.get
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    evolveSchema(schema, source.schema, mergeSchema = false)
    checkConstraints(source, snap.constraints, table)
    // normalize the source to the full table row (missing nullable
    // columns → null), in schema order, so the rewrite unions cleanly
    val src = schema.fields.foldLeft(source) { (df, f) =>
      if (source.schema.fieldNames.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(schema.fieldNames.map(col): _*)
    val (fs, root) = fsFor(spark, table)
    def abs(f: String) = new Path(root, f).toString
    // touched files = those holding ≥1 LIVE matched key (the snapshot's
    // deletion vectors applied — a DV-hidden row cannot match); snapshot
    // entries are table-relative (or absolute for clones) and the scan
    // yields absolute URIs — matched on the trailing <uuid>/<name> pair,
    // unique by construction of the staging dirs.
    val byKey = snap.files.map(f => fileKey(f) -> f).toMap
    val srcKeys = src.select(keyCols.map(col): _*).distinct()
    val touched =
      if (snap.files.isEmpty) Nil
      else liveRows(spark, snap, root, snap.files)
        .join(srcKeys, keyCols, "left_semi")
        .select("_graft_file").distinct()
        .collect().toSeq.map(_.getString(0))
        .flatMap(byKey.get)
    def touchedLive = liveRows(spark, snap, root, touched)
      .select(schema.fieldNames.map(col): _*)
    // new content = the touched files' UNMATCHED live rows + every source
    // row (rewriting a DV'd touched file also materializes its vectors)
    val untouchedRows =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else touchedLive.join(srcKeys, keyCols, "left_anti")
    val statsCols = snap.stats.values.flatMap(_.keys).toSeq.distinct
    val (_, added, stats) =
      stageData(spark, fs, root, untouchedRows.unionByName(src), statsCols)
    // CDF precompute (the public Delta design: MERGE writes its change
    // rows at COMMIT time, so every change-feed read — batch or streaming
    // — is a pure file scan, never a re-join). Diff the retired LIVE rows
    // against the bytes that actually landed.
    val pre =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else touchedLive
    val post = spark.read.schema(schema).parquet(added.map(abs): _*)
    val changeDf = mergeDiff(pre, post, keyCols, schema)
    val cdfStage = s"cdf/${java.util.UUID.randomUUID}"
    changeDf.write.parquet(new Path(root, cdfStage).toString)
    val cdfFiles = fs.listStatus(new Path(root, cdfStage)).toSeq
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .sorted.map(n => s"$cdfStage/$n")
    commitRewrite(spark, table, touched, added, stats, snap.schemaJson,
      op = "merge",
      extra = List(
        "mergeKey" -> JArray(keyCols.map(JString(_)).toList),
        "cdf" -> JArray(cdfFiles.map(JString(_)).toList)))
  }

  /** The keyed diff behind MERGE's change feed: full-outer join of the
    * retired rows (`pre`) and the landed rows (`post`) on `keyCols`,
    * classified per key — `insert` (new key), `delete` (removed key),
    * `update_preimage`+`update_postimage` (payload changed, null-safe
    * struct compare), NOTHING for identical rows (copied neighbors in a
    * rewritten file, no-op updates). Output = table columns +
    * `_change_type`.
    */
  private def mergeDiff(pre: DataFrame, post: DataFrame,
      keyCols: Seq[String], schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, not, struct}
    val dataCols = schema.fieldNames.filterNot(keyCols.contains).toSeq
    // a key-only table has no payload to diff: the constant payload makes
    // every matched pair compare equal, so only insert/delete can emit
    def payload =
      if (dataCols.isEmpty) lit(0)
      else struct(dataCols.map(col): _*)
    def sided(df: DataFrame, as: String) =
      df.select(keyCols.map(col) :+ payload.as(as): _*)
    val joined = sided(pre, "_pre").join(sided(post, "_post"), keyCols, "full_outer")
    def emit(cond: org.apache.spark.sql.Column, side: String, tag: String) =
      joined.filter(cond).select(
        (keyCols.map(col) ++ dataCols.map(c => col(s"$side.$c").as(c)) ++
          Seq(lit(tag).as("_change_type"))): _*)
        .select(schema.fieldNames.map(col) :+ col("_change_type"): _*)
    val changed = col("_pre").isNotNull && col("_post").isNotNull &&
      not(col("_pre") <=> col("_post"))
    emit(col("_pre").isNull && col("_post").isNotNull, "_post", "insert")
      .unionByName(emit(col("_post").isNull && col("_pre").isNotNull, "_pre", "delete"))
      .unionByName(emit(changed, "_pre", "update_preimage"))
      .unionByName(emit(changed, "_post", "update_postimage"))
  }

  /** A batch violated a table CHECK constraint at write time. */
  final class ConstraintViolationException(msg: String)
    extends IllegalArgumentException(msg)

  /** Add a CHECK constraint (SQL boolean expression over the table's
    * columns; NULL passes, the standard CHECK semantics). EXISTING rows
    * are validated first (one scan — the Delta contract: a constraint
    * can only be added when the table already satisfies it); every later
    * append/merge batch is validated before staging and rejected loudly
    * on violation. Recorded as a metadata commit (no data files), carried
    * through checkpoints, visible in [[history]]. Returns the commit
    * version. Note the documented write-write anomaly shared with the
    * public designs: a batch validated against a snapshot that predates a
    * RACING addConstraint can land unvalidated — add constraints in quiet
    * windows.
    */
  def addConstraint(spark: SparkSession, table: String, name: String,
      sqlExpr: String): Int = {
    import org.apache.spark.sql.functions.{expr, not}
    require(name.nonEmpty && sqlExpr.nonEmpty, "constraint needs a name and an expression")
    val existing = read(spark, table)
    if (!existing.isEmpty && existing.filter(not(expr(sqlExpr))).limit(1).count() > 0)
      throw new ConstraintViolationException(
        s"cannot add CHECK constraint $name ($sqlExpr) to $table: existing rows violate it")
    commitMeta(spark, table, "constraint_add",
      List("cName" -> JString(name), "cExpr" -> JString(sqlExpr)))
  }

  /** Drop a CHECK constraint by name (no-op error if absent). */
  def dropConstraint(spark: SparkSession, table: String, name: String): Int = {
    val snap = snapshot(spark, table, None)
    require(snap.constraints.contains(name),
      s"$table has no CHECK constraint named $name (has: ${snap.constraints.keys.mkString(", ")})")
    commitMeta(spark, table, "constraint_drop", List("cName" -> JString(name)))
  }

  /** Reject `df` if it violates any of `constraints` — ONE combined job
    * over the batch for the common all-pass case; violation pays a
    * per-constraint re-check to name the culprit in the error.
    */
  private def checkConstraints(df: DataFrame,
      constraints: Map[String, String], table: String): Unit = {
    if (constraints.isEmpty) return
    import org.apache.spark.sql.functions.{expr, not}
    val anyViolation = constraints.values.map(e => not(expr(e)))
      .reduce(_ || _)
    if (df.filter(anyViolation).limit(1).count() > 0) {
      val culprit = constraints.find { case (_, e) =>
        df.filter(not(expr(e))).limit(1).count() > 0
      }.map { case (n, e) => s"$n ($e)" }.getOrElse("unknown")
      throw new ConstraintViolationException(
        s"batch violates CHECK constraint $culprit on $table; nothing was committed")
    }
  }

  /** The claim loop for METADATA-only commits (constraints): no data
    * files move, the entry just folds new table state into the log.
    */
  private def commitMeta(spark: SparkSession, table: String, op: String,
      fields: List[(String, JValue)]): Int = {
    val (fs, root) = fsFor(spark, table)
    var attempt = 0
    while (attempt < 64) {
      val cur = resolve(spark, table, None).getOrElse(
        throw new IllegalArgumentException(
          s"$table has no commits; constraints attach to existing tables"))
      val next = cur.version + 1
      val entry = JsonMethods.compact(JsonMethods.render(JObject(
        List[(String, JValue)](
          "version" -> JInt(next),
          "op" -> JString(op),
          "schema" -> JString(cur.schemaJson),
          "add" -> JArray(Nil),
          "remove" -> JArray(Nil)) ++ fields)))
      if (createExclusive(fs, new Path(new Path(root, LogDir), logName(next)), entry)) {
        val cs = applyConstraintOp(cur.constraints, op, fields)
        maybeCheckpoint(fs, root, next, cur.schemaJson,
          files = cur.files, txns = cur.txns, stats = cur.stats,
          constraints = cs, dvs = cur.dvs)
        return next
      }
      attempt += 1
    }
    throw new CommitContentionException(
      s"lost 64 consecutive version-claim races on $table; aborting $op")
  }

  private def applyConstraintOp(cs: Map[String, String], op: String,
      fields: List[(String, JValue)]): Map[String, String] = {
    val f = fields.toMap
    def fstr(k: String) = f.get(k).collect { case JString(s) => s }.getOrElse("")
    op match {
      case "constraint_add"  => cs + (fstr("cName") -> fstr("cExpr"))
      case "constraint_drop" => cs - fstr("cName")
      case _                 => cs
    }
  }

  /** The trailing `<uuid-dir>/<name>` pair of any file path — unique by
    * construction of the staging dirs; the join key between snapshot
    * entries (table-relative, or absolute for clones) and the absolute
    * URIs `input_file_name()`/`_metadata.file_path` yield.
    */
  private def fileKey(p: String): String = p.split('/').takeRight(2).mkString("/")

  /** The LIVE rows of `files` under `snap`: deletion-vector-hidden rows
    * removed. Carries `_graft_file` (the [[fileKey]]) for callers that
    * need per-file attribution; callers drop it. The DV anti-join keys on
    * (file, parquet `_metadata.row_index`) — row positions are stable
    * because data files are immutable. Tables without DVs take the plain
    * scan (no metadata columns, no join).
    */
  private def liveRows(spark: SparkSession, snap: Snapshot, root: Path,
      files: Seq[String]): DataFrame =
    liveRowsOf(spark,
      DataType.fromJson(snap.schemaJson).asInstanceOf[StructType],
      snap.dvs, root, files)

  /** `files` read with the (file, row_index) metadata columns
    * materialized up front (codegen'd regexp, no UDF — downstream joins
    * may not propagate `_metadata` resolution).
    */
  private def readWithMeta(spark: SparkSession, schema: StructType,
      root: Path, files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, substring_index}
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .withColumn("_graft_file", lit(""))
        .withColumn("_graft_ri", lit(0L))
    // substring_index, NOT a regexp: the fileKey is the last two path
    // components, and extracting it with a per-row java.util.regex cost
    // 3.8 s where the whole DV-applied scan costs 0.4 (MorCostProbe at
    // sf0.1 — the metadata columns and the anti-join are both ~free; the
    // regex was 90% of c13's steady cost and 17x the plain scan)
    spark.read.schema(schema).parquet(files.map(f => new Path(root, f).toString): _*)
      .withColumn("_graft_file",
        substring_index(col("_metadata.file_path"), "/", -2))
      .withColumn("_graft_ri", col("_metadata.row_index"))
  }

  /** [[liveRows]] keyed by explicit (schema, dv map) instead of a resolved
    * snapshot — the change feed replays HISTORICAL dv states that no
    * single snapshot object carries.
    */
  private def liveRowsOf(spark: SparkSession, schema: StructType,
      dvs: Map[String, Seq[String]], root: Path,
      files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val withMeta = readWithMeta(spark, schema, root, files)
    if (files.isEmpty) return withMeta
    val dvFiles = dvs.view.filterKeys(files.contains).values.flatten.toSeq.distinct
    def abs(f: String) = new Path(root, f).toString
    if (dvFiles.isEmpty)
      withMeta
    else {
      val dv = spark.read.parquet(dvFiles.map(abs): _*)
        .select(col("file").as("_graft_file"), col("row_index").as("_graft_ri"))
      withMeta.join(dv, Seq("_graft_file", "_graft_ri"), "left_anti")
    }
  }

  /** The DISTINCT hidden (file, row_index) positions `dvs` records for
    * `files` — one sidecar scan restricted to the requested file keys (a
    * sidecar written by a multi-file MoR delete carries entries for every
    * touched file). Used by the change feed's RESTORE diff.
    */
  private def hiddenPositions(spark: SparkSession,
      dvs: Map[String, Seq[String]], root: Path,
      files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import org.apache.spark.sql.types.{LongType, StringType}
    val posSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("file", StringType),
      org.apache.spark.sql.types.StructField("row_index", LongType)))
    val dvFiles = dvs.view.filterKeys(files.contains).values.flatten.toSeq.distinct
    if (dvFiles.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], posSchema)
    def abs(f: String) = new Path(root, f).toString
    val keys = spark.createDataFrame(
      spark.sparkContext.parallelize(
        files.map(f => org.apache.spark.sql.Row(fileKey(f))), 1),
      StructType(Seq(org.apache.spark.sql.types.StructField("file", StringType))))
    spark.read.parquet(dvFiles.map(abs): _*)
      .select(col("file"), col("row_index"))
      .join(broadcast(keys), Seq("file"), "left_semi")
      .distinct()
  }

  /** MERGE-ON-READ delete via DELETION VECTORS — the write-cheap sibling
    * of [[commitDelete]]: instead of rewriting every touched file (cost ∝
    * touched BYTES), record a per-file sidecar of the row POSITIONS to
    * hide (cost ∝ matched ROWS — at 100 TB, deleting a few rows from a
    * petabyte of files is a sidecar write, not a rewrite). Reads apply
    * the vectors with one anti-join on (file, `_metadata.row_index`);
    * every internal reader (merge, CoW delete, optimize) is DV-aware, and
    * any rewrite that retires a file MATERIALIZES its vectors away (the
    * OPTIMIZE-purges-DVs contract of the public design). The matched rows
    * also land as commit-time change files, so the feed serves exact
    * deletes as a pure scan. DVs on one file ACCUMULATE across MoR
    * deletes. Returns the committed version (unchanged when nothing
    * matches). Concurrent MoR deletes with OVERLAPPING predicates can
    * double-emit feed rows — serialize overlapping DML, the same
    * write-conflict rule the public designs enforce coarser.
    */
  def commitDeleteMoR(spark: SparkSession, table: String,
      predicate: org.apache.spark.sql.Column): Int = {
    import org.apache.spark.sql.functions.{col, lit}
    val resolved = resolve(spark, table, None)
    if (resolved.isEmpty) return 0
    val snap = resolved.get
    if (snap.files.isEmpty) return snap.version
    val (fs, root) = fsFor(spark, table)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    // matched LIVE rows (already-hidden rows cannot match again), with
    // their (file, row_index) addresses
    val matched = liveRows(spark, snap, root, snap.files)
      .filter(predicate)
      .localCheckpoint(true) // DV write + cdf write must see ONE evaluation
    val nMatched = matched.count() // checkpointed: a cheap metadata job
    if (nMatched == 0) return snap.version
    val byKey = snap.files.map(f => fileKey(f) -> f).toMap
    // sidecar/change-file shard counts: ONE file for the common few-row
    // delete (many tiny parts would make every DV-applied read list+open
    // them all), sharded by file key above a row threshold so a predicate
    // matching 1% of a 100 TB table fans out across tasks instead of
    // funneling ~1 TB through one (the shard key clusters a data file's
    // positions together; per-file volume is bounded by file row count)
    def shards(rowsPerFile: Long): Int =
      math.min(256L, (nMatched + rowsPerFile - 1) / rowsPerFile).toInt
    def sharded(df: DataFrame, n: Int, key: String): DataFrame =
      if (n <= 1) df.coalesce(1) else df.repartition(n, col(key))
    // one DV sidecar set for this commit: (file, row_index) of hidden rows
    val dvStage = s"dv/${java.util.UUID.randomUUID}"
    sharded(matched.select(col("_graft_file").as("file"),
        col("_graft_ri").as("row_index")), shards(4000000L), "file")
      .write.parquet(new Path(root, dvStage).toString)
    val dvFiles = fs.listStatus(new Path(root, dvStage)).toSeq
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .sorted.map(n => s"$dvStage/$n")
    // the DV applies to every file that lost rows
    val touched = matched.select("_graft_file").distinct()
      .collect().toSeq.flatMap(r => byKey.get(r.getString(0)))
    // commit-time change files: the exact matched rows, delete-tagged
    val cdfStage = s"cdf/${java.util.UUID.randomUUID}"
    sharded(matched.select(schema.fieldNames.map(col) :+ col("_graft_file"): _*)
        .withColumn("_change_type", lit("delete")), shards(1000000L), "_graft_file")
      .drop("_graft_file")
      .write.parquet(new Path(root, cdfStage).toString)
    val cdfFiles = fs.listStatus(new Path(root, cdfStage)).toSeq
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .sorted.map(n => s"$cdfStage/$n")
    commitRewrite(spark, table, removed = Nil, added = Nil,
      stats = Map.empty, schemaJson = snap.schemaJson, op = "delete_mor",
      extra = List(
        "dv" -> JObject(touched.toList.map(f =>
          f -> (JArray(dvFiles.map(JString(_)).toList): JValue))),
        "cdf" -> JArray(cdfFiles.map(JString(_)).toList)),
      requireActive = touched)
  }

  /** Row-level DELETE (copy-on-write): rewrites ONLY the files holding
    * rows that match `predicate` — survivors in touched files are copied
    * forward, untouched files stay referenced as-is (cost ∝ touched
    * files, never ∝ table). The matched rows are staged as commit-time
    * change files, so the change feed serves the exact deleted rows as a
    * pure scan ([[changes]] `_change_type = 'delete'`; survivors emit
    * nothing). `predicate` must be deterministic (it evaluates twice:
    * touched-file discovery and the survivor rewrite). Returns the
    * committed version — unchanged when nothing matches (a no-op delete
    * claims no version).
    */
  def commitDelete(spark: SparkSession, table: String,
      predicate: org.apache.spark.sql.Column): Int = {
    import org.apache.spark.sql.functions.{col, input_file_name, lit, not}
    val resolved = resolve(spark, table, None)
    if (resolved.isEmpty) return 0 // nothing committed: delete is a no-op
    val snap = resolved.get
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val (fs, root) = fsFor(spark, table)
    def abs(f: String) = new Path(root, f).toString
    if (snap.files.isEmpty) return snap.version
    val byKey = snap.files.map(f => fileKey(f) -> f).toMap
    val touched = liveRows(spark, snap, root, snap.files)
      .filter(predicate)
      .select("_graft_file").distinct()
      .collect().toSeq.map(_.getString(0))
      .flatMap(byKey.get)
    if (touched.isEmpty) return snap.version
    // live rows only: a DV'd touched file rewrites without its hidden
    // rows (the rewrite materializes the vectors away)
    val touchedDf = liveRows(spark, snap, root, touched)
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    val statsCols = snap.stats.values.flatMap(_.keys).toSeq.distinct
    val (_, added, stats) =
      stageData(spark, fs, root, touchedDf.filter(not(predicate)), statsCols)
    // commit-time change files: the exact matched rows, delete-tagged
    val cdfStage = s"cdf/${java.util.UUID.randomUUID}"
    touchedDf.filter(predicate)
      .withColumn("_change_type", lit("delete"))
      .write.parquet(new Path(root, cdfStage).toString)
    val cdfFiles = fs.listStatus(new Path(root, cdfStage)).toSeq
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .sorted.map(n => s"$cdfStage/$n")
    commitRewrite(spark, table, touched, added, stats, snap.schemaJson,
      op = "delete",
      extra = List("cdf" -> JArray(cdfFiles.map(JString(_)).toList)))
  }

  /** RESTORE the table to `version`'s content as ONE log write — no data
    * bytes move: the commit removes files not in the target snapshot and
    * re-adds the target's files by their existing paths (they must still
    * exist, i.e. `version` inside the vacuum horizon — loud at read time
    * otherwise, the public RESTORE contract). Time travel keeps serving
    * the pre-restore versions; the change feed emits the content DIFF
    * (deletes for files leaving the active set, inserts for files
    * returning, and — when merge-on-read deletes are in play — the
    * deletion-vector diff on files common to both versions: rows the
    * target hides but the current snapshot serves emit `delete`, rows the
    * current snapshot hides but the target serves emit `insert`; rows
    * live on both sides emit nothing).
    *
    * DELETION-VECTOR state is part of the restored content: the commit
    * carries the TARGET snapshot's dv map as a `dvReset` entry that
    * REPLACES (never accumulates onto) the standing vectors on replay —
    * without it, restoring past a [[commitDeleteMoR]] would resurrect the
    * hidden rows (the content changed while the file set did not), the
    * exact failure the public Delta RESTORE avoids by carrying dv state
    * on its file entries. The no-op check compares file set AND dv state
    * for the same reason. Returns the restore commit's version.
    */
  def restore(spark: SparkSession, table: String, version: Int): Int = {
    val target = snapshot(spark, table, Some(version))
    val cur = snapshot(spark, table, None)
    require(target.version == version,
      s"$table has no version $version (resolved ${target.version})")
    val targetSet = target.files.toSet
    val curSet = cur.files.toSet
    // content identity needs file-set AND deletion-vector equality: a MoR
    // delete changes content without touching the file set
    if (targetSet == curSet && target.dvs == cur.dvs)
      return cur.version // content already current
    val removed = cur.files.filterNot(targetSet)
    val added = target.files.filterNot(curSet)
    val stats = target.stats.filter { case (f, _) => added.contains(f) }
    commitRewrite(spark, table, removed, added, stats, target.schemaJson,
      op = "restore",
      extra = List(
        "dvReset" -> JBool(true),
        "dv" -> JObject(target.dvs.toList.map { case (f, ps) =>
          f -> (JArray(ps.map(JString(_)).toList): JValue) })))
  }

  /** TIMESTAMP-based time travel: the highest version committed at or
    * before `tsMillis` (log-entry modification time — the public
    * `TIMESTAMP AS OF` resolution rule). Loud when the table has no
    * commit that old.
    */
  def versionAt(spark: SparkSession, table: String, tsMillis: Long): Int = {
    val (fs, root) = fsFor(spark, table)
    val logDir = new Path(root, LogDir)
    if (!fs.exists(logDir))
      throw new IllegalArgumentException(s"$table has no commits")
    val vs = fs.listStatus(logDir).toSeq.collect {
      case st if CommitRe.matches(st.getPath.getName) &&
          st.getModificationTime <= tsMillis =>
        st.getPath.getName match { case CommitRe(v) => v.toInt }
    }
    if (vs.isEmpty) throw new IllegalArgumentException(
      s"$table has no commit at or before timestamp $tsMillis")
    vs.max
  }

  /** Snapshot read as of a wall-clock timestamp (millis). */
  def readAt(spark: SparkSession, table: String, tsMillis: Long): DataFrame =
    read(spark, table, Some(versionAt(spark, table, tsMillis)))

  /** DESCRIBE HISTORY: one row per RETAINED log entry — (version, op,
    * commit timestamp, files added/removed, the streaming txn and merge
    * key when present). Driver-side log reads only (bytes ∝ entries);
    * entries retired by [[cleanupLog]] are absent (the retained-history
    * contract).
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val (fs, root) = fsFor(spark, table)
    val logDir = new Path(root, LogDir)
    val rows =
      if (!fs.exists(logDir)) Nil
      else fs.listStatus(logDir).toSeq.collect {
        case st if CommitRe.matches(st.getPath.getName) =>
          val v = st.getPath.getName match { case CommitRe(x) => x.toInt }
          val j = readJson(fs, st.getPath)
          val op = str(j, "op") match { case "" => "append"; case o => o }
          val txn = (j \ "txnApp", j \ "txnId") match {
            case (JString(app), JInt(id)) => Some(s"$app#$id")
            case _ => None
          }
          val mergeKey = arr(j, "mergeKey") match {
            case Nil => None
            case ks  => Some(ks.mkString(","))
          }
          (v, op, st.getModificationTime,
            arr(j, "add").size, arr(j, "remove").size, txn, mergeKey)
      }.sortBy(_._1)
    rows.toDF("version", "op", "timestamp_ms",
      "n_added", "n_removed", "txn", "merge_key")
  }

  /** The optimistic claim loop for remove+add REWRITE commits
    * (optimize/merge). Unlike [[commit]], a lost race does NOT blindly
    * retry: the rewrite's content was computed from a specific snapshot,
    * so the precondition re-checks that every file being removed is still
    * active — a concurrent append is compatible (retry proceeds), a
    * concurrent overwrite/merge that retired one of them aborts the
    * rewrite ([[ConcurrentRewriteException]]) rather than resurrecting
    * superseded rows.
    */
  private[sources] def commitRewrite(spark: SparkSession, table: String,
      removed: Seq[String], added: Seq[String],
      stats: Map[String, Map[String, (Double, Double)]],
      schemaJson: String, op: String,
      extra: List[(String, JValue)] = Nil,
      requireActive: Seq[String] = Nil): Int = {
    val (fs, root) = fsFor(spark, table)
    var attempt = 0
    while (attempt < 64) {
      val cur = resolve(spark, table, None).getOrElse(
        throw new IllegalArgumentException(s"$table has no commits to rewrite"))
      val active = cur.files.toSet
      val gone = (removed ++ requireActive).filterNot(active)
      if (gone.nonEmpty) throw new ConcurrentRewriteException(
        s"$op on $table lost to a concurrent commit that retired " +
          s"${gone.size} file(s) being rewritten (e.g. ${gone.head}); " +
          "staged rewrite files are unreferenced and vacuum-able")
      val next = cur.version + 1
      val entry = JsonMethods.compact(JsonMethods.render(JObject(
        List[(String, JValue)](
          "version" -> JInt(next),
          "op" -> JString(op),
          "schema" -> JString(schemaJson),
          "add" -> JArray(added.map(JString(_)).toList),
          "remove" -> JArray(removed.map(JString(_)).toList)) ++
          (if (stats.isEmpty) Nil else List("stats" -> statsJson(stats))) ++
          extra)))
      if (createExclusive(fs, new Path(new Path(root, LogDir), logName(next)), entry)) {
        val extraJ = JObject(extra)
        // dvReset (RESTORE): the entry's dv map REPLACES the standing
        // vectors; otherwise new vectors accumulate onto surviving files
        val newDvs =
          if (extraJ \ "dvReset" == JBool(true)) dvsOf(extraJ)
          else (cur.dvs -- removed) ++
            dvsOf(extraJ).map { case (f, paths) =>
              f -> (cur.dvs.getOrElse(f, Nil) ++ paths)
            }
        maybeCheckpoint(fs, root, next, schemaJson,
          files = cur.files.filterNot(removed.toSet) ++ added,
          txns = cur.txns,
          stats = cur.stats -- removed ++ stats,
          constraints = cur.constraints,
          dvs = newDvs)
        return next
      }
      attempt += 1
    }
    throw new CommitContentionException(
      s"lost 64 consecutive version-claim races on $table; aborting $op")
  }

  private def commit(spark: SparkSession, table: String, df: DataFrame,
      overwrite: Boolean, txn: Option[(String, Long)] = None,
      statsCols: Seq[String] = Nil, mergeSchema: Boolean = false): Int = {
    val (fs, root) = fsFor(spark, table)
    fs.mkdirs(new Path(root, LogDir))
    // fast-fail schema + CHECK-constraint enforcement BEFORE staging: a
    // rejected batch should cost a log listing + one batch scan, not a
    // parquet write whose files then sit as orphans until vacuum's age
    // floor passes (schema is re-checked per claim attempt below — this is
    // the cheap first gate, not the authoritative one)
    resolve(spark, table, None).foreach { c =>
      if (!overwrite && c.schemaJson.nonEmpty)
        evolveSchema(DataType.fromJson(c.schemaJson).asInstanceOf[StructType],
          df.schema, mergeSchema)
      checkConstraints(df, c.constraints, table)
    }
    // 1. conflict-free data staging
    val (stage, added, stats) = stageData(spark, fs, root, df, statsCols)
    // 2. optimistic version claim; remove-set AND schema check recomputed
    //    per attempt so an append losing a race enforces against the schema
    //    it actually lands on (a racing evolved append may have widened it).
    var attempt = 0
    while (attempt < 64) {
      val cur = resolve(spark, table, None)
      // a duplicate streaming batch detected AFTER losing a claim race:
      // the winner (or an earlier attempt) already recorded this txn
      txn.foreach { case (app, id) =>
        if (cur.exists(_.txns.get(app).exists(_ >= id)))
          return cur.get.version
      }
      // schema-on-write: appends enforce/evolve against the CURRENT
      // snapshot schema; overwrites and first commits record the batch's
      val schemaJson = cur match {
        case Some(c) if !overwrite && c.schemaJson.nonEmpty =>
          evolveSchema(DataType.fromJson(c.schemaJson).asInstanceOf[StructType],
            df.schema, mergeSchema).json
        case _ => df.schema.json
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
        maybeCheckpoint(fs, root, next, schemaJson,
          files = cur.map(_.files).getOrElse(Nil).filterNot(removed.toSet) ++ added,
          txns = cur.map(_.txns).getOrElse(Map.empty) ++ txn.toMap,
          stats = cur.map(_.stats).getOrElse(Map.empty) -- removed ++ stats,
          constraints = cur.map(_.constraints).getOrElse(Map.empty),
          dvs = cur.map(_.dvs).getOrElse(Map.empty) -- removed)
        return next
      }
      attempt += 1
    }
    throw new CommitContentionException(
      s"lost 64 consecutive version-claim races on $table; aborting commit " +
        s"(staged files under $stage are unreferenced and vacuum-able)")
  }

  /** Every [[checkpointInterval]] commits, write the full-state checkpoint.
    * Best-effort: a lost checkpoint only costs replay length.
    */
  private def maybeCheckpoint(fs: FileSystem, root: Path, next: Int,
      schemaJson: String, files: Seq[String], txns: Map[String, Long],
      stats: Map[String, Map[String, (Double, Double)]],
      constraints: Map[String, String] = Map.empty,
      dvs: Map[String, Seq[String]] = Map.empty): Unit = {
    if (next % checkpointInterval != 0) return
    val cp = JsonMethods.compact(JsonMethods.render(JObject(
      "version" -> JInt(next),
      "schema" -> JString(schemaJson),
      "txns" -> JObject(txns.toList.map { case (k, v) => k -> (JInt(v): JValue) }),
      "stats" -> statsJson(stats),
      "constraints" -> JObject(constraints.toList.map { case (k, v) => k -> (JString(v): JValue) }),
      "dv" -> JObject(dvs.toList.map { case (k, v) =>
        k -> (JArray(v.map(JString(_)).toList): JValue) }),
      "files" -> JArray(files.map(JString(_)).toList))))
    // temp-name + rename, NOT create(overwrite=true) in place: an in-place
    // create is visible half-written to a concurrent lister, unlike the
    // O_EXCL-atomic commit entries. Rename is atomic on local FS and HDFS;
    // stores where it is not are covered by resolve()'s parse-failure
    // fallback to the previous checkpoint.
    val cpFinal = new Path(new Path(root, LogDir), checkpointName(next))
    val cpTmp = new Path(new Path(root, LogDir),
      s".${checkpointName(next)}.${java.util.UUID.randomUUID}.tmp")
    val out = fs.create(cpTmp, true)
    try out.write(cp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(cpTmp, cpFinal)) { fs.delete(cpTmp, false); return }
    // advance the pointer AFTER the checkpoint is visible (readers verify
    // the named checkpoint exists before trusting the pointer); a crash
    // between the two leaves a stale pointer, which only lengthens the
    // next reader's tail replay
    try {
      val p = fs.create(new Path(new Path(root, LogDir), LastCheckpoint), true)
      try p.write(s"""{"version":$next}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally p.close()
    } catch { case _: Exception => () } // pointer is an optimization only
  }

  /** Stage `df` under a fresh conflict-free `data/<uuid>/` dir (the dir
    * name is unique, so staging never conflicts with any concurrent
    * writer) and return (stage dir, relative file paths, per-file stats).
    *
    * Stats: ONE grouped aggregate over the freshly staged bytes covering
    * every stat column (cost ∝ batch, never ∝ table) — the lakehouse
    * file-skipping index, carried in the log entry itself.
    */
  private def stageData(spark: SparkSession, fs: FileSystem, root: Path,
      df: DataFrame, statsCols: Seq[String])
      : (String, Seq[String], Map[String, Map[String, (Double, Double)]]) = {
    val stage = s"data/${java.util.UUID.randomUUID}"
    df.write.parquet(new Path(root, stage).toString)
    val added = fs.listStatus(new Path(root, stage)).toSeq
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .sorted
      .map(n => s"$stage/$n")
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
            // widen each bound by 1 ulp: the double cast rounds half-even,
            // so a BIGINT above 2^53 can round its recorded max BELOW the
            // true max (min above the true min) and pruning would silently
            // skip a file holding a matching row. nextDown/nextUp keeps the
            // recorded range a superset of the true range — pruning stays
            // conservative at every magnitude.
            file -> statsCols.map(c =>
              c -> (Math.nextDown(r.getAs[Double](s"lo_$c")),
                Math.nextUp(r.getAs[Double](s"hi_$c")))).toMap
          }
          .toMap
      }
    (stage, added, stats)
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

  /** The (active file list, deletion-vector map) standing at `version` —
    * empty for version 0 / an uncommitted table. The change feed (batch
    * and streaming) seeds its version walk with this.
    */
  private[sources] def activeState(spark: SparkSession, table: String,
      version: Int): (Seq[String], Map[String, Seq[String]]) =
    if (version <= 0) (Nil, Map.empty)
    else resolve(spark, table, Some(version))
      .map(s => (s.files, s.dvs)).getOrElse((Nil, Map.empty))

  /** Mutable fold state for checkpoint-load + commit-tail replay. */
  private final class LogState {
    var files = Vector.empty[String]
    var schema = ""
    var txns = Map.empty[String, Long]
    var stats = Map.empty[String, Map[String, (Double, Double)]]
    var constraints = Map.empty[String, String]
    var dvs = Map.empty[String, Seq[String]]
  }

  /** Load checkpoint `v` into a fresh [[LogState]]; None on any parse or
    * read failure (half-written/corrupt checkpoint on a non-atomic store).
    */
  private def readCheckpointState(fs: FileSystem, logDir: Path,
      v: Int): Option[LogState] =
    try {
      val j = readJson(fs, new Path(logDir, checkpointName(v)))
      val st = new LogState
      st.files = arr(j, "files").toVector
      st.schema = str(j, "schema")
      st.txns = j \ "txns" match {
        case JObject(fields) => fields.collect { case (k, JInt(v)) => k -> v.toLong }.toMap
        case _ => Map.empty
      }
      st.stats = statsOf(j)
      st.constraints = j \ "constraints" match {
        case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }
      st.dvs = dvsOf(j)
      Some(st)
    } catch { case _: Exception => None }

  private def resolve(spark: SparkSession, table: String,
      asOf: Option[Int]): Option[Snapshot] = {
    val (fs, root) = fsFor(spark, table)
    val logDir = new Path(root, LogDir)
    if (!fs.exists(logDir)) return None
    // ---- pointer fast path (LATEST resolution only): the `_last_checkpoint`
    // pointer (the public Delta design) names the newest checkpoint, and
    // commit versions are CONTIGUOUS by construction (each claims exactly
    // current+1 via O_EXCL create) — so the latest snapshot is one tiny
    // pointer read + one checkpoint + O(tail) per-name existence probes,
    // never a full log listing. The listing is the only depth-linear term
    // in resolution (measured 8.4 → 29.3 ms across a 100 → 1,000-commit
    // log before this path; ScaleCheckLog/BASELINE.md) — at a 100 TB
    // table's commit cadence the log dir holds 10^5+ entries and every
    // read would pay it. Stale pointers only lengthen the tail replay;
    // corrupt/missing pointers or checkpoints fall through to the listing.
    if (asOf.isEmpty) {
      val ptr = try {
        readJson(fs, new Path(logDir, LastCheckpoint)) \ "version" match {
          case JInt(v) => Some(v.toInt)
          case _ => None
        }
      } catch { case _: Exception => None }
      ptr.flatMap { cpV => readCheckpointState(fs, logDir, cpV).map(cpV -> _) }
        .foreach { case (cpV, st) =>
          var latest = cpV
          while (fs.exists(new Path(logDir, logName(latest + 1)))) latest += 1
          ((cpV + 1) to latest).foreach { v =>
            applyCommit(st, readJson(fs, new Path(logDir, logName(v))))
          }
          return Some(Snapshot(latest, st.schema, st.files, st.txns,
            st.stats, st.constraints, st.dvs))
        }
    }
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    val commits = names.collect {
      case n @ CommitRe(v) => v.toInt -> n
    }.filter { case (v, _) => asOf.forall(v <= _) }.sortBy(_._1)
    if (commits.isEmpty) return None
    val target = commits.last._1
    // newest-first checkpoint candidates: a half-written/corrupt checkpoint
    // (non-atomic store, crashed writer) falls back to the previous one,
    // then to full log replay — never a read crash.
    val cpCandidates = names.collect {
      case CheckpointRe(v) => v.toInt
    }.filter(_ <= target).sorted.reverse
    val (cpVersion, st) = cpCandidates.iterator
      .map(v => readCheckpointState(fs, logDir, v).map(v -> _))
      .collectFirst { case Some(hit) => hit }
      .map { case (v, s) => (Some(v), s) }
      .getOrElse((None, new LogState))
    commits.collect { case (v, n) if v > cpVersion.getOrElse(0) => (v, n) }.foreach {
      case (_, n) => applyCommit(st, readJson(fs, new Path(logDir, n)))
    }
    Some(Snapshot(target, st.schema, st.files, st.txns, st.stats,
      st.constraints, st.dvs))
  }

  /** Fold one commit entry into `st` — the tail-replay step shared by the
    * pointer fast path and the listing path.
    */
  private def applyCommit(st: LogState, j: JValue): Unit = {
    val rm = arr(j, "remove").toSet
    st.files = st.files.filterNot(rm) ++ arr(j, "add")
    st.schema = str(j, "schema")
    (j \ "txnApp", j \ "txnId") match {
      case (JString(app), JInt(id)) => st.txns += app -> id.toLong
      case _ =>
    }
    st.stats = st.stats -- rm ++ statsOf(j)
    st.constraints = applyConstraintOp(st.constraints, str(j, "op"),
      List("cName" -> (j \ "cName"), "cExpr" -> (j \ "cExpr")))
    // a retired file's deletion vectors die with it; new DVs for a
    // still-active file ACCUMULATE onto any standing ones — except a
    // dvReset entry (RESTORE), whose dv map REPLACES the state outright
    st.dvs = st.dvs -- rm
    if (j \ "dvReset" == JBool(true)) st.dvs = dvsOf(j)
    else dvsOf(j).foreach { case (f, paths) =>
      st.dvs += f -> (st.dvs.getOrElse(f, Nil) ++ paths)
    }
  }

  private def statsJson(stats: Map[String, Map[String, (Double, Double)]]): JObject =
    JObject(stats.toList.map { case (f, cols) =>
      f -> (JObject(cols.toList.map { case (c, (lo, hi)) =>
        c -> (JArray(List(JDouble(lo), JDouble(hi))): JValue)
      }): JValue)
    })

  private[sources] def dvsOf(j: JValue): Map[String, Seq[String]] =
    j \ "dv" match {
      case JObject(fields) => fields.collect {
        case (f, JArray(xs)) => f -> xs.collect { case JString(x) => x }
      }.toMap
      case _ => Map.empty
    }

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
    *
    * The read ALWAYS applies the snapshot's RECORDED schema (never footer
    * inference): a multi-schema history — files written before a
    * `mergeSchema` evolution — reads deterministically as the evolved
    * schema, with pre-evolution files filling added columns with null and
    * widened columns upcast by the parquet reader. Footer inference would
    * make the result depend on which file the reader sampled first.
    */
  def read(spark: SparkSession, table: String, versionAsOf: Option[Int] = None): DataFrame = {
    val snap = snapshot(spark, table, versionAsOf)
    val (_, root) = fsFor(spark, table)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (snap.dvs.isEmpty)
      spark.read.schema(schema)
        .parquet(snap.files.map(f => new Path(root, f).toString): _*)
    else // deletion vectors active: the read applies them (merge-on-read)
      liveRows(spark, snap, root, snap.files)
        .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
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
        "stats" -> statsJson(snap.stats.map { case (f, cols) => absolute(f) -> cols }),
        // the source's DELETION VECTORS are part of the cloned content —
        // without them the clone resurrects every MoR-hidden row (the
        // same interplay class as the r14 RESTORE bug). Sidecar paths
        // absolutize like the data files; the clone depends on them under
        // the same source-retention contract.
        "dv" -> JObject(snap.dvs.toList.map { case (f, ps) =>
          absolute(f) -> (JArray(ps.map(p => JString(absolute(p))).toList): JValue)
        })))))
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
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    if (keep.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (snap.dvs.isEmpty)
      spark.read.schema(schema)
        .parquet(keep.map(f => new Path(root, f).toString): _*)
    else liveRows(spark, snap, root, keep)
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }

  /** CHANGE DATA FEED: every row-level change in versions
    * `(fromVersion, toVersion]`, tagged `_change_type` and
    * `_commit_version` — the downstream-sync surface (incremental ETL,
    * streaming CDC out of the table). The full public surface:
    *  - appends emit `insert`; overwrites emit `delete` for every retired
    *    file's rows plus `insert` for the new content;
    *  - MERGE versions ([[commitMerge]]) diff the rewritten files BY THE
    *    RECORDED KEY: a changed row emits `update_preimage` +
    *    `update_postimage`, a new key `insert`, a removed key `delete`;
    *    rewritten-but-identical rows (copied neighbors, no-op updates)
    *    emit NOTHING — downstream folds see exactly the logical change;
    *  - OPTIMIZE versions emit nothing (content-identical by
    *    construction).
    * Requires the per-version log entries (loud error if vacuumed/
    * checkpoint-trimmed away) and the retired data files (pre-vacuum).
    * A valid range whose versions are all no-ops returns an EMPTY frame
    * with the change schema.
    */
  def changes(spark: SparkSession, table: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(fromVersion < toVersion,
      s"empty change range ($fromVersion, $toVersion]")
    val (fs, root) = fsFor(spark, table)
    val logDir = new Path(root, LogDir)
    def abs(f: String) = new Path(root, f).toString
    def readFiles(files: Seq[String], schema: StructType): DataFrame =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.map(abs): _*)
    // the walk carries the PRE-version (file list, dv map) — removed-file
    // reads must apply the deletion vectors standing at v-1, or a later
    // overwrite/restore re-emits already-hidden rows as deletes and a ±1
    // incremental fold double-counts them
    var (preFiles, preDvs) = activeState(spark, table, fromVersion)
    val parts = ((fromVersion + 1) to toVersion).flatMap { v =>
      val p = new Path(logDir, logName(v))
      if (!fs.exists(p)) throw new IllegalArgumentException(
        s"$table has no log entry for version $v (vacuumed or checkpoint-trimmed); " +
          "change feed is only available for retained versions")
      val j = readJson(fs, p)
      val add = arr(j, "add"); val rm = arr(j, "remove")
      val schema = DataType.fromJson(str(j, "schema")).asInstanceOf[StructType]
      def live(files: Seq[String], dvs: Map[String, Seq[String]], tag: String) =
        liveRowsOf(spark, schema, dvs, root, files)
          .select(schema.fieldNames.map(col): _*)
          .withColumn("_change_type", lit(tag))
          .withColumn("_commit_version", lit(v))
      val out: Seq[DataFrame] = str(j, "op") match {
        case "optimize" => Nil // physical-only rewrite: no logical change
        case "merge" | "delete" | "delete_mor" =>
          // MERGE/DELETE versions carry their change rows as files written
          // at commit time (update pre/post images with their tags baked
          // in; deletes tagged at staging) — the feed read is a pure scan,
          // never a re-diff of the rewritten files (which would wrongly
          // emit the copied survivors)
          val cdf = arr(j, "cdf")
          if (cdf.isEmpty) Nil // a rewrite that changed nothing
          else Seq(readFiles(cdf,
              schema.add("_change_type", org.apache.spark.sql.types.StringType))
            .withColumn("_commit_version", lit(v)))
        case "restore" =>
          // the content diff: deletes for rows leaving (live-at-v-1 rows
          // of removed files), inserts for rows returning (target-live
          // rows of re-added files — the entry's dvReset map IS the
          // target's dv state), PLUS the dv diff on files active on both
          // sides: a row hidden at v-1 but live at the target resurrects
          // (insert), a row live at v-1 but hidden at the target leaves
          // (delete). Rows live on both sides emit nothing.
          val tgtDvs = dvsOf(j)
          val del = if (rm.nonEmpty) Seq(live(rm, preDvs, "delete")) else Nil
          val ins = if (add.nonEmpty) Seq(live(add, tgtDvs, "insert")) else Nil
          val kept = preFiles.filterNot(rm.toSet)
          val dvKept = kept.filter(f => preDvs.contains(f) || tgtDvs.contains(f))
          val diff =
            if (dvKept.isEmpty) Nil
            else {
              val pre = hiddenPositions(spark, preDvs, root, dvKept)
              val tgt = hiddenPositions(spark, tgtDvs, root, dvKept)
              val meta = readWithMeta(spark, schema, root, dvKept)
              def pick(pos: DataFrame, tag: String) =
                meta.join(
                    pos.withColumnRenamed("file", "_graft_file")
                      .withColumnRenamed("row_index", "_graft_ri"),
                    Seq("_graft_file", "_graft_ri"), "left_semi")
                  .select(schema.fieldNames.map(col): _*)
                  .withColumn("_change_type", lit(tag))
                  .withColumn("_commit_version", lit(v))
              Seq(pick(pre.except(tgt), "insert"),
                pick(tgt.except(pre), "delete"))
            }
          del ++ ins ++ diff
        case _ =>
          val del = if (rm.nonEmpty) Seq(live(rm, preDvs, "delete")) else Nil
          // a plain append/overwrite entry carries no dv field (fast path:
          // raw read); a CLONE entry does — its inserts are the source's
          // LIVE rows, with the carried vectors applied
          val entryDvs = dvsOf(j)
          val ins = if (add.isEmpty) Nil
            else if (entryDvs.isEmpty)
              Seq(readFiles(add, schema)
                .withColumn("_change_type", lit("insert"))
                .withColumn("_commit_version", lit(v)))
            else Seq(live(add, entryDvs, "insert"))
          del ++ ins
      }
      // advance the walk's state exactly as [[resolve]]'s replay does
      preFiles = preFiles.filterNot(rm.toSet) ++ add
      preDvs = preDvs -- rm
      if (j \ "dvReset" == JBool(true)) preDvs = dvsOf(j)
      else dvsOf(j).foreach { case (f, paths) =>
        preDvs += f -> (preDvs.getOrElse(f, Nil) ++ paths)
      }
      out
    }
    if (parts.nonEmpty) parts.reduce(_.unionByName(_, allowMissingColumns = true))
    else {
      // valid range, only no-op versions: empty frame with the CDF schema
      val snap = snapshot(spark, table, Some(toVersion))
      val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
        .add("_change_type", org.apache.spark.sql.types.StringType)
        .add("_commit_version", org.apache.spark.sql.types.IntegerType)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
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
    val cpVersions = names.collect { case CheckpointRe(v) => v.toInt }
    if (cpVersions.isEmpty) return 0 // nothing absorbed yet — keep all
    val cur = currentVersion(spark, table)
    // always retain the newest entry (resolution anchors on commit
    // entries; a checkpoint alone cannot define the current version)
    val horizon = math.min(cpVersions.max, cur - math.max(1, retainVersions))
    var removed = 0
    names.foreach {
      case n @ CommitRe(vs) =>
        val v = vs.toInt
        // an entry is deletable only when BOTH absorbed by a checkpoint
        // (some checkpoint version ≥ v exists) and outside the horizon
        if (v <= horizon && cpVersions.exists(_ >= v)) {
          // a retired merge/delete entry's change files are unreachable
          // (the feed requires the entry) — reclaim their stage dirs with
          // it (recursive: each commit's cdf/<uuid>/ dir is exclusively
          // its own, and holds writer droppings — _SUCCESS, crc — beyond
          // the listed part files)
          val cdf = try arr(readJson(fs, new Path(logDir, n)), "cdf")
            catch { case _: Exception => Nil }
          cdf.map(f => new Path(root, f).getParent).distinct
            .foreach(dir => fs.delete(dir, true))
          fs.delete(new Path(logDir, n), false); removed += 1
        }
      case _ => // foreign/temp/checkpoint files are not ours to delete
    }
    removed
  }

  /** Default vacuum file-age floor (24 h) — see [[vacuum]]'s race analysis. */
  val DefaultVacuumAgeMillis: Long = 24L * 3600 * 1000

  /** Delete data files unreferenced by every snapshot newer than
    * `retainVersions` back from current (older versions stop being
    * time-travel-readable). Returns the number of files deleted.
    *
    * `minAgeMillis` is the IN-FLIGHT-COMMIT guard: the commit protocol
    * stages files under `data/<uuid>/` BEFORE claiming a log version, so a
    * concurrent vacuum cannot tell a live in-flight stage from an aborted
    * one by reference-counting alone. Files younger than the floor
    * (modification time) are never touched — the standard Delta mitigation;
    * no real commit stages for 24 h. Pass 0 ONLY when no writer can be
    * running (tests, single-process maintenance windows).
    */
  def vacuum(spark: SparkSession, table: String, retainVersions: Int,
      minAgeMillis: Long = DefaultVacuumAgeMillis): Int = {
    val (fs, root) = fsFor(spark, table)
    val cur = currentVersion(spark, table)
    val horizon = math.max(1, cur - retainVersions)
    val live = (horizon to cur)
      .flatMap(v => resolve(spark, table, Some(v)).map(_.files).getOrElse(Nil)).toSet
    val liveDv = (horizon to cur)
      .flatMap(v => resolve(spark, table, Some(v))
        .map(_.dvs.values.flatten.toSeq).getOrElse(Nil)).toSet
    val cutoff = System.currentTimeMillis() - math.max(0L, minAgeMillis)
    var removed = 0
    def sweep(dirName: String, liveSet: Set[String]): Unit = {
      val dir = new Path(root, dirName)
      if (!fs.exists(dir)) return
      fs.listStatus(dir).foreach { stageDir =>
        fs.listStatus(stageDir.getPath).foreach { f =>
          val rel = s"$dirName/${stageDir.getPath.getName}/${f.getPath.getName}"
          val visible = !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")
          if (visible && !liveSet.contains(rel) && f.getModificationTime <= cutoff) {
            fs.delete(f.getPath, false); removed += 1
          }
        }
        // a stage dir whose VISIBLE files are all gone holds only writer
        // droppings (_SUCCESS, .crc) — reclaim it recursively, or orphan
        // dirs accumulate one dropping each forever. Age-gated like the
        // files: an in-flight stage younger than the floor is never a
        // candidate (its visible part files haven't aged out either).
        val leftovers = fs.listStatus(stageDir.getPath)
        val anyVisible = leftovers.exists { f =>
          !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".") }
        // the age gate must hold RECURSIVELY: an in-flight FileOutputCommitter
        // write stages task files under `_temporary/0/...`, so an old stage
        // dir with old direct children can still hold FRESH deep task files —
        // checking only two levels would delete the stage mid-write
        // (r15 ADVICE). fs.listFiles(recursive) walks leaf files only, which
        // is exactly the set whose mtimes matter.
        def maxDeepMtime(p: Path): Long = {
          var m = 0L
          val it = fs.listFiles(p, true)
          while (it.hasNext) m = math.max(m, it.next().getModificationTime)
          m
        }
        if (!anyVisible &&
            leftovers.forall(_.getModificationTime <= cutoff) &&
            stageDir.getModificationTime <= cutoff &&
            maxDeepMtime(stageDir.getPath) <= cutoff)
          fs.delete(stageDir.getPath, true)
      }
    }
    sweep("data", live)
    sweep("dv", liveDv) // deletion-vector sidecars follow the same horizon
    removed
  }
}

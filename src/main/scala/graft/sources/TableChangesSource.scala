package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.json4s.{JArray, JString, JValue}
import org.json4s.jackson.JsonMethods

/** A17→J13: `graft-table-changes` — a DataSource V2 micro-batch STREAMING
  * source over a [[SnapshotTable]]'s change data feed, with TABLE VERSIONS
  * as the offset protocol.
  *
  * This composes A17's change feed with the [[SlotLogSource]] machinery:
  * downstream sync becomes a `readStream`, not a manual two-increment fold —
  * Spark checkpoints the last consumed VERSION with the query, and a killed
  * stream restarted on the same checkpoint resumes at exactly the first
  * unconsumed commit (no version lost, none re-delivered; the public Delta
  * CDF-streaming contract). Each micro-batch covers a version range
  * `(start, end]`; `maxVersionsPerBatch` (default: all available) bounds a
  * catch-up batch so a long-idle consumer drains in increments.
  *
  * Feed semantics per version are [[SnapshotTable.changes]]'s, read from
  * the SAME artifacts: appends emit `insert`, overwrites `delete`+`insert`,
  * MERGE versions scan the change files written at commit time
  * (update pre/post images precomputed — the read is never a re-join),
  * OPTIMIZE versions emit nothing. Planning is one log-entry read per
  * version on the driver (bytes ∝ files, never rows); each data file is its
  * own [[InputPartition]], so a big commit fans out across executors.
  *
  * The readers decode parquet through the parquet-mr Group API (the
  * streaming scan sits outside Spark's file-source planner, so the
  * row-level decode is the connector's job). Supported column types: the
  * flat primitive core (long/int/short/byte/double/float/boolean/string)
  * — checked loudly at stream construction. Widened columns (an int file
  * read as the table's evolved long) upcast per the file's primitive type;
  * columns missing from a pre-evolution file read as null.
  */
class TableChangesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-table-changes"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TableChangesSource.feedSchema(TableChangesSource.tableSchema(options.get("path")))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-table-changes requires .option(\"path\", <snapshot table root>)")
    val starting = Option(properties.get("startingVersion")).map(_.toInt).getOrElse(0)
    val maxPerBatch = Option(properties.get("maxVersionsPerBatch")).map(_.toInt)
      .getOrElse(Int.MaxValue)
    require(maxPerBatch > 0, s"maxVersionsPerBatch must be positive, got $maxPerBatch")
    new TableChangesTable(path, starting, maxPerBatch)
  }
}

object TableChangesSource {
  private[sources] def tableSchema(path: String): StructType = {
    require(path != null && path.nonEmpty,
      "graft-table-changes requires .option(\"path\", <snapshot table root>)")
    val spark = SparkSession.active
    val snap = SnapshotTable.snapshot(spark, path)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    schema.fields.foreach { f =>
      require(supported(f.dataType),
        s"graft-table-changes supports flat primitive columns only; " +
          s"column ${f.name} has type ${f.dataType.simpleString}")
    }
    schema
  }

  private def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | BooleanType | StringType => true
    case _ => false
  }

  private[sources] def feedSchema(table: StructType): StructType =
    table
      .add("_change_type", StringType, nullable = false)
      .add("_commit_version", IntegerType, nullable = false)
}

private[sources] class TableChangesTable(path: String, startingVersion: Int,
    maxVersionsPerBatch: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-table-changes($path)"
  override def schema(): StructType =
    TableChangesSource.feedSchema(TableChangesSource.tableSchema(path))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        private val tableSchema = TableChangesSource.tableSchema(path)
        override def readSchema(): StructType = TableChangesSource.feedSchema(tableSchema)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TableChangesMicroBatchStream(path, startingVersion,
            maxVersionsPerBatch, tableSchema)
      }
    }
}

/** Streaming offset: the last CONSUMED table version. */
private[sources] case class VersionOffset(v: Int) extends Offset {
  override def json: String = v.toString
}

private[sources] class TableChangesMicroBatchStream(path: String,
    startingVersion: Int, maxVersionsPerBatch: Int, tableSchema: StructType)
  extends MicroBatchStream with SupportsAdmissionControl {

  private def spark = SparkSession.active

  override def initialOffset(): Offset = VersionOffset(startingVersion)
  override def deserializeOffset(json: String): Offset = VersionOffset(json.trim.toInt)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control: the batch end is the current committed version,
    * capped `maxVersionsPerBatch` past the checkpointed start — a consumer
    * resuming after a long gap drains the backlog in bounded increments.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset].v
    val cur = SnapshotTable.currentVersion(spark, path)
    VersionOffset(math.min(cur, s + math.max(1, maxVersionsPerBatch)))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: Spark calls latestOffset(start, limit)")

  /** One log-entry read per version on the driver; one partition per data
    * file so a big commit's decode fans out across executors.
    *
    * The walk carries the PRE-version deletion-vector map (mirroring
    * [[SnapshotTable.changes]]): removed-file delete partitions EXCLUDE
    * the rows v-1's vectors already hid, and a RESTORE version emits the
    * dv DIFF on files active on both sides — without this, an overwrite
    * after a MoR delete re-emits the hidden rows as deletes and a ±1
    * incremental consumer double-counts them.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    if (e <= s) return Array.empty
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def abs(f: String) = new Path(root, f).toString
    def key(f: String) = f.split('/').takeRight(2).mkString("/")
    var (preFiles, preDvs) = SnapshotTable.activeState(spark, path, s)
    ((s + 1) to e).flatMap { v =>
      val p = new Path(new Path(root, "_graft_log"), f"v$v%010d.json")
      if (!fs.exists(p)) throw new IllegalArgumentException(
        s"$path has no log entry for version $v (vacuumed or checkpoint-trimmed); " +
          "the change-feed stream requires retained versions")
      val in = fs.open(p)
      val j = try JsonMethods.parse(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)) finally in.close()
      def files(field: String): Seq[String] = j \ field match {
        case JArray(xs) => xs.collect { case JString(x) => x }
        case _ => Nil
      }
      val rm = files("remove"); val add = files("add")
      def excl(f: String, dvs: Map[String, Seq[String]], tag: String) =
        ChangeFilePartition(abs(f), v, tag, fileKey = key(f),
          dvA = dvs.getOrElse(f, Nil).map(abs))
      val out: Seq[InputPartition] = (j \ "op": JValue) match {
        case JString("optimize") => Nil // physical-only rewrite
        case JString("merge") | JString("delete") | JString("delete_mor") =>
          // rewrites serve their commit-time change files (tags baked in);
          // diffing add/remove here would wrongly emit copied survivors
          files("cdf").map(f => ChangeFilePartition(abs(f), v, injectType = null))
        case JString("restore") =>
          // deletes for rows leaving (v-1-live rows of removed files),
          // inserts for rows returning (target-live rows of re-added
          // files; the entry's dvReset map IS the target's dv state), and
          // the dv diff on kept files: hidden@pre \ hidden@target rows
          // resurrect (insert), hidden@target \ hidden@pre rows leave
          // (delete)
          val tgtDvs = SnapshotTable.dvsOf(j)
          val kept = preFiles.filterNot(rm.toSet)
          rm.map(f => excl(f, preDvs, "delete")) ++
            add.map(f => excl(f, tgtDvs, "insert")) ++
            kept.filter(f => preDvs.contains(f) || tgtDvs.contains(f))
              .flatMap { f =>
                val pre = preDvs.getOrElse(f, Nil).map(abs)
                val tgt = tgtDvs.getOrElse(f, Nil).map(abs)
                // an empty minuend can't emit — skip the scan outright
                (if (pre.isEmpty) Nil
                 else Seq(ChangeFilePartition(abs(f), v, "insert",
                   fileKey = key(f), dvA = pre, dvB = tgt, dvMode = "diff"))) ++
                (if (tgt.isEmpty) Nil
                 else Seq(ChangeFilePartition(abs(f), v, "delete",
                   fileKey = key(f), dvA = tgt, dvB = pre, dvMode = "diff")))
              }
        case _ =>
          // append / overwrite / clone: the file diff IS the row diff,
          // with v-1's vectors applied to retiring files and the entry's
          // own dv map (a clone's carried vectors; empty for appends)
          // applied to arriving ones
          val entryDvs = SnapshotTable.dvsOf(j)
          rm.map(f => excl(f, preDvs, "delete")) ++
            add.map(f => excl(f, entryDvs, "insert"))
      }
      // advance the walk's state exactly as the log replay does
      preFiles = preFiles.filterNot(rm.toSet) ++ add
      preDvs = preDvs -- rm
      if (j \ "dvReset" == org.json4s.JBool(true)) preDvs = SnapshotTable.dvsOf(j)
      else SnapshotTable.dvsOf(j).foreach { case (f, paths) =>
        preDvs += f -> (preDvs.getOrElse(f, Nil) ++ paths)
      }
      out
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // serialize the DRIVER's hadoop configuration entries: executor-side
    // readers on a table root needing configured FS settings (s3a
    // credentials, custom schemes) must not fall back to a bare default
    // Configuration
    val conf = spark.sessionState.newHadoopConf()
    val props = {
      val b = Map.newBuilder[String, String]
      val it = conf.iterator()
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    new ChangeFileReaderFactory(TableChangesSource.feedSchema(tableSchema), props)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One change-feed data file: `injectType` carries the constant change
  * type for append/overwrite files; null means the file itself holds a
  * `_change_type` column (a merge's precomputed change file).
  *
  * Deletion-vector semantics (`fileKey` addresses this file in sidecars):
  *  - `dvMode = "exclude"`: emit rows whose position is NOT in the `dvA`
  *    sidecars — the retiring file's rows minus what v-1 already hid;
  *  - `dvMode = "diff"`: emit ONLY rows whose position is in `dvA` but
  *    not `dvB` — a restore's resurrected (pre \ target) or re-hidden
  *    (target \ pre) rows.
  * Sidecar position sets load into executor memory — bounded by the rows
  * of ONE data file (positions are 16 bytes each).
  */
private[sources] case class ChangeFilePartition(file: String, version: Int,
    injectType: String, fileKey: String = "",
    dvA: Seq[String] = Nil, dvB: Seq[String] = Nil,
    dvMode: String = "exclude") extends InputPartition

private[sources] class ChangeFileReaderFactory(readSchema: StructType,
    confProps: Map[String, String]) extends PartitionReaderFactory {

  private def hadoopConf(): Configuration = {
    val c = new Configuration(false)
    confProps.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** The row positions the `paths` sidecars record for `fileKey`.
    * Parsed sidecars are cached JVM-wide by path
    * ([[ChangeFileReaderFactory.sidecarCache]]): a restore diff over N kept
    * files touched by one multi-file MoR delete otherwise re-scans the same
    * shared sidecar up to 2N times on an executor (the insert and delete
    * partitions each reload it) — sidecar IO quadratic in kept-file count
    * (r15 ADVICE). Sidecar files are write-once (content lives under the
    * commit that created it and is never rewritten), so path-keyed caching
    * is sound.
    */
  private def positions(paths: Seq[String], fileKey: String): java.util.HashSet[Long] = {
    val set = new java.util.HashSet[Long]()
    paths.foreach { sp =>
      val byFile = ChangeFileReaderFactory.sidecarCache.computeIfAbsent(sp, { _ =>
        val m = new java.util.HashMap[String, java.util.HashSet[Long]]()
        @annotation.nowarn("cat=deprecation")
        val r: ParquetReader[Group] = ParquetReader
          .builder(new GroupReadSupport(), new Path(sp))
          .withConf(hadoopConf())
          .build()
        try {
          var g = r.read()
          while (g != null) {
            val t = g.getType
            val fi = t.getFieldIndex("file")
            if (g.getFieldRepetitionCount(fi) > 0) {
              val key = g.getBinary(fi, 0).toStringUsingUTF8
              m.computeIfAbsent(key, _ => new java.util.HashSet[Long]())
                .add(g.getLong(t.getFieldIndex("row_index"), 0))
            }
            g = r.read()
          }
        } finally r.close()
        m
      })
      val s = byFile.get(fileKey)
      if (s != null) set.addAll(s)
    }
    set
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangeFilePartition]
    new PartitionReader[InternalRow] {
      @annotation.nowarn("cat=deprecation")
      private val reader: ParquetReader[Group] = ParquetReader
        .builder(new GroupReadSupport(), new Path(p.file))
        .withConf(hadoopConf())
        .build()
      private var row: InternalRow = _
      private var pos: Long = -1L
      // lazily built: the common no-DV partition never reads sidecars
      private lazy val setA = positions(p.dvA, p.fileKey)
      private lazy val setB = positions(p.dvB, p.fileKey)
      private def emits(i: Long): Boolean = p.dvMode match {
        case "diff" => setA.contains(i) && !setB.contains(i)
        case _      => p.dvA.isEmpty || !setA.contains(i)
      }

      override def next(): Boolean = {
        var g = reader.read()
        pos += 1
        while (g != null && !emits(pos)) { g = reader.read(); pos += 1 }
        if (g == null) return false
        val values = new Array[Any](readSchema.length)
        var i = 0
        while (i < readSchema.length) {
          val f = readSchema(i)
          values(i) = f.name match {
            case "_commit_version" => p.version
            case "_change_type" if p.injectType != null =>
              UTF8String.fromString(p.injectType)
            case name => readField(g, name, f.dataType)
          }
          i += 1
        }
        row = InternalRow.fromSeq(values.toIndexedSeq)
        true
      }

      /** Group → Catalyst value by NAME: a column absent from the file (a
        * pre-evolution commit) or null in this record reads as null; a
        * narrower file primitive than the requested type upcasts (the
        * widening-read contract of the evolved snapshot schema).
        */
      private def readField(g: Group, name: String, dt: DataType): Any = {
        val gt = g.getType
        if (!gt.containsField(name)) return null
        val idx = gt.getFieldIndex(name)
        if (g.getFieldRepetitionCount(idx) == 0) return null
        val prim = gt.getType(idx).asPrimitiveType().getPrimitiveTypeName
        (dt, prim) match {
          case (LongType, PrimitiveTypeName.INT64)    => g.getLong(idx, 0)
          case (LongType, PrimitiveTypeName.INT32)    => g.getInteger(idx, 0).toLong
          case (IntegerType, PrimitiveTypeName.INT32) => g.getInteger(idx, 0)
          case (ShortType, PrimitiveTypeName.INT32)   => g.getInteger(idx, 0).toShort
          case (ByteType, PrimitiveTypeName.INT32)    => g.getInteger(idx, 0).toByte
          case (DoubleType, PrimitiveTypeName.DOUBLE) => g.getDouble(idx, 0)
          case (DoubleType, PrimitiveTypeName.FLOAT)  => g.getFloat(idx, 0).toDouble
          case (FloatType, PrimitiveTypeName.FLOAT)   => g.getFloat(idx, 0)
          case (BooleanType, PrimitiveTypeName.BOOLEAN) => g.getBoolean(idx, 0)
          case (StringType, PrimitiveTypeName.BINARY) =>
            UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
          case (want, got) => throw new IllegalStateException(
            s"change-feed reader: column $name has parquet type $got, " +
              s"requested ${want.simpleString}")
        }
      }

      override def get(): InternalRow = row
      override def close(): Unit = reader.close()
    }
  }
}

private[sources] object ChangeFileReaderFactory {
  /** JVM-wide parsed-sidecar cache: sidecar path -> (fileKey -> hidden row
    * positions). Sidecars are write-once, so entries never invalidate;
    * bounded by eviction-on-cap (a scan touches a bounded sidecar set, and
    * one entry costs ~16 bytes per originally-deleted row). Shared across
    * partitions AND scans on the executor — the cross-partition reuse is
    * the point (see [[ChangeFileReaderFactory.positions]]).
    */
  private val MaxEntries = 64
  val sidecarCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashMap[String, java.util.HashSet[Long]]]() {
    override def computeIfAbsent(key: String,
        f: java.util.function.Function[
          ? >: String, ? <: java.util.HashMap[String, java.util.HashSet[Long]]])
        : java.util.HashMap[String, java.util.HashSet[Long]] = {
      if (size() >= MaxEntries && !containsKey(key)) clear()
      super.computeIfAbsent(key, f)
    }
  }
}

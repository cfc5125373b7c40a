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
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    if (e <= s) return Array.empty
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def abs(f: String) = new Path(root, f).toString
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
      (j \ "op": JValue) match {
        case JString("optimize") => Nil // physical-only rewrite
        case JString("merge") | JString("delete") | JString("delete_mor") =>
          // rewrites serve their commit-time change files (tags baked in);
          // diffing add/remove here would wrongly emit copied survivors
          files("cdf").map(f => ChangeFilePartition(abs(f), v, injectType = null))
        case _ =>
          // append / overwrite / restore: the file diff IS the row diff
          files("remove").map(f => ChangeFilePartition(abs(f), v, "delete")) ++
            files("add").map(f => ChangeFilePartition(abs(f), v, "insert"))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFileReaderFactory(TableChangesSource.feedSchema(tableSchema))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One change-feed data file: `injectType` carries the constant change
  * type for append/overwrite files; null means the file itself holds a
  * `_change_type` column (a merge's precomputed change file).
  */
private[sources] case class ChangeFilePartition(file: String, version: Int,
    injectType: String) extends InputPartition

private[sources] class ChangeFileReaderFactory(readSchema: StructType)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangeFilePartition]
    new PartitionReader[InternalRow] {
      @annotation.nowarn("cat=deprecation")
      private val reader: ParquetReader[Group] = ParquetReader
        .builder(new GroupReadSupport(), new Path(p.file))
        .withConf(new Configuration())
        .build()
      private var row: InternalRow = _

      override def next(): Boolean = {
        val g = reader.read()
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

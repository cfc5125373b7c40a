package graft.sources

import java.io.RandomAccessFile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A2/J1: `slotlog` — a DataSource V2 micro-batch streaming source over an
  * append-only JSONL event log, with RESUMABLE byte-cursor offsets.
  *
  * This is the Spark-native shape of the reference's intended live source:
  * a Yellowstone gRPC slot subscription (`/root/reference/README.md:3`,
  * stubbed at `adapters/src/solana_grpc.rs:8-24`). Yellowstone's contract is
  * "subscribe from a slot cursor; on reconnect, resume from the last
  * processed slot — nothing lost, nothing re-delivered". Spark expresses
  * exactly that contract through the [[MicroBatchStream]] offset protocol:
  * the engine checkpoints this source's offset with the query, and on
  * restart hands it back via [[SlotLogMicroBatchStream.deserializeOffset]] —
  * resume-from-cursor is driven by the checkpoint, not by connector-private
  * state. Kill the query at any point and restart it on the same checkpoint:
  * the next batch begins at exactly the first unprocessed event.
  *
  * Design choices, Kafka-source style:
  *   - The emitted schema is the RAW feed — `slot LONG, value STRING` — and
  *     payload parsing (`from_json`) is a downstream plan stage
  *     ([[graft.streaming.EventStreams.subscribeSlotLog]]). Keeping decode
  *     out of the connector means corrupt records are per-row skips in the
  *     plan (the reference's per-item error-skip, `solana.rs:51-53`), never
  *     connector crashes.
  *   - An offset is the byte position AFTER the last complete
  *     (newline-terminated) line. A producer's partially-written tail line
  *     is invisible until its `\n` lands, so a batch never reads a torn
  *     record. `latestOffset` scans only the bytes appended since the last
  *     poll (O(new data) per trigger, not O(log)).
  *   - `slot` is the record's byte cursor — monotone, unique, and stable
  *     across restarts, usable downstream exactly like a Yellowstone slot
  *     (ordering, provenance, resume bookkeeping).
  *
  * Scale note: this connector is the single-subscription contract (one gRPC
  * stream ≙ one log). At production rates the same raw-feed schema and the
  * same downstream plan sit on a partitioned source (Kafka/Kinesis); only
  * `planInputPartitions` changes. A batch's bytes are materialized in one
  * reader (micro-batch-sized by arrival rate, not by corpus size).
  */
class SlotLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "slotlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SlotLogSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SlotLogTable(properties.get("path"))
}

object SlotLogSource {
  /** Raw-feed schema: the cursor of each record + its undecoded line. */
  val schema: StructType = StructType(Seq(
    StructField("slot", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

private[sources] class SlotLogTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "slotlog requires .option(\"path\", <event log file>)")
  override def name(): String = s"slotlog($path)"
  override def schema(): StructType = SlotLogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SlotLogSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SlotLogMicroBatchStream(path)
      }
    }
}

/** Streaming offset: byte position after the last complete line. */
private[sources] case class SlotOffset(pos: Long) extends Offset {
  override def json: String = pos.toString
}

private[sources] class SlotLogMicroBatchStream(path: String) extends MicroBatchStream {
  // Incremental newline scan: `scannedTo` is how far we've looked,
  // `lastComplete` the byte after the last '\n' seen. Both are poll-side
  // caches only — restart correctness comes from the checkpointed offset,
  // which Spark replays through deserializeOffset.
  private var scannedTo = 0L
  private var lastComplete = 0L

  override def latestOffset(): Offset = {
    val f = new java.io.File(path)
    if (f.exists()) {
      val len = f.length()
      if (len < scannedTo) {
        // The log shrank: an append-only contract violation (rotation or
        // truncation). Fail loudly rather than silently re-serving bytes —
        // the checkpointed offsets of already-run batches no longer
        // describe this file.
        throw new IllegalStateException(
          s"slotlog $path shrank from $scannedTo to $len bytes; " +
            "the log must be append-only (rotate to a new path + new checkpoint instead)")
      }
      if (len > scannedTo) {
        val raf = new RandomAccessFile(f, "r")
        try {
          raf.seek(scannedTo)
          val buf = new Array[Byte](64 * 1024)
          var pos = scannedTo
          while (pos < len) {
            val n = raf.read(buf, 0, math.min(buf.length.toLong, len - pos).toInt)
            if (n <= 0) pos = len
            else {
              var i = 0
              while (i < n) {
                if (buf(i) == '\n') lastComplete = pos + i + 1
                i += 1
              }
              pos += n
            }
          }
          scannedTo = len
        } finally raf.close()
      }
    }
    SlotOffset(lastComplete)
  }

  override def initialOffset(): Offset = SlotOffset(0L)
  override def deserializeOffset(json: String): Offset = SlotOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SlotOffset].pos
    val e = end.asInstanceOf[SlotOffset].pos
    if (e <= s) Array.empty else Array(SlotLogRange(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory = new SlotLogReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class SlotLogRange(path: String, start: Long, end: Long)
  extends InputPartition

private[sources] class SlotLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SlotLogRange]
    new PartitionReader[InternalRow] {
      // Both offsets are complete-line boundaries, so the range parses into
      // whole lines with no carry between partitions.
      private val bytes: Array[Byte] = {
        val raf = new RandomAccessFile(p.path, "r")
        try {
          raf.seek(p.start)
          val b = new Array[Byte]((p.end - p.start).toInt)
          raf.readFully(b)
          b
        } finally raf.close()
      }
      private var cursor = 0
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (cursor >= bytes.length) false
        else {
          val lineStart = cursor
          while (cursor < bytes.length && bytes(cursor) != '\n') cursor += 1
          val lineEnd = cursor // exclusive; bytes(cursor) == '\n' by offset contract
          cursor += 1
          row = InternalRow(
            p.start + lineStart,
            UTF8String.fromBytes(bytes, lineStart, lineEnd - lineStart))
          true
        }
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

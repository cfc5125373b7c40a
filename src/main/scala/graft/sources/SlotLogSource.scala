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
  * Scale design: a micro-batch's byte range SPLITS across readers. A
  * large batch (slow trigger or a burst on a fast feed) is planned as up
  * to `maxPartitions` line-aligned sub-ranges of at most
  * `maxBytesPerPartition` bytes each (`.option(...)`, defaults 32 ×
  * 16 MiB), so no single task funnels the whole batch; within a task the
  * reader STREAMS lines through a fixed 64 KiB buffer instead of
  * materializing the range — peak heap per task is one buffer plus the
  * longest line, independent of batch size. Offsets stay line-aligned by
  * construction (split candidates snap forward to the next newline), so
  * every sub-range parses whole lines with no carry between readers.
  * The single-file log is the single-subscription contract (one gRPC
  * stream ≙ one log); at production rates the same raw-feed schema and
  * downstream plan sit on a partitioned source (Kafka/Kinesis) — only
  * the range-planning below changes.
  */
class SlotLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "slotlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SlotLogSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SlotLogTable(
      properties.get("path"),
      SlotLogSource.longProp(properties, "maxBytesPerPartition",
        SlotLogSource.DefaultMaxBytesPerPartition),
      SlotLogSource.longProp(properties, "maxPartitions",
        SlotLogSource.DefaultMaxPartitions).toInt)
}

object SlotLogSource {
  /** Raw-feed schema: the cursor of each record + its undecoded line. */
  val schema: StructType = StructType(Seq(
    StructField("slot", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Per-reader byte budget: micro-batches smaller than this stay a
    * single task (the common steady-state trigger).
    */
  val DefaultMaxBytesPerPartition: Long = 16L * 1024 * 1024
  val DefaultMaxPartitions: Long = 32L

  private def longProp(props: java.util.Map[String, String], name: String,
      dflt: Long): Long = {
    val v = props.get(name)
    if (v == null) dflt
    else {
      val n = v.toLong
      require(n > 0, s"slotlog option $name must be positive, got $n")
      n
    }
  }
}

private[sources] class SlotLogTable(path: String, maxBytesPerPartition: Long,
    maxPartitions: Int) extends Table with SupportsRead {
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
          new SlotLogMicroBatchStream(path, maxBytesPerPartition, maxPartitions)
      }
    }
}

/** Streaming offset: byte position after the last complete line. */
private[sources] case class SlotOffset(pos: Long) extends Offset {
  override def json: String = pos.toString
}

private[sources] class SlotLogMicroBatchStream(path: String,
    maxBytesPerPartition: Long, maxPartitions: Int) extends MicroBatchStream {
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

  /** Split the batch's byte range into line-aligned sub-ranges: candidate
    * cut points at equal byte strides, each snapped FORWARD to the byte
    * after the next newline (one seek + a short scan per cut — driver
    * cost is O(partitions), not O(bytes)). Snapping can collapse cuts on
    * long lines; collapsed cuts merge into their neighbor rather than
    * emitting empty ranges.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SlotOffset].pos
    val e = end.asInstanceOf[SlotOffset].pos
    if (e <= s) return Array.empty
    val n = math.min(maxPartitions.toLong,
      (e - s + maxBytesPerPartition - 1) / maxBytesPerPartition).toInt
    if (n <= 1) return Array(SlotLogRange(path, s, e))
    val raf = new RandomAccessFile(path, "r")
    try {
      val bounds = Array.newBuilder[Long]
      bounds += s
      var prev = s
      var i = 1
      while (i < n) {
        val candidate = math.max(s + (e - s) * i / n, prev)
        val snapped = nextLineBoundary(raf, candidate, e)
        if (snapped > prev && snapped < e) { bounds += snapped; prev = snapped }
        i += 1
      }
      bounds += e
      bounds.result().sliding(2).collect {
        case Array(a, b) if b > a => SlotLogRange(path, a, b)
      }.toArray
    } finally raf.close()
  }

  /** Byte position after the first '\n' at or after `from` (capped at
    * `limit`). `from` may sit mid-line; the return is always a complete-
    * line boundary because the batch range itself ends on one.
    */
  private def nextLineBoundary(raf: RandomAccessFile, from: Long, limit: Long): Long = {
    raf.seek(from)
    val buf = new Array[Byte](8 * 1024)
    var pos = from
    while (pos < limit) {
      val n = raf.read(buf, 0, math.min(buf.length.toLong, limit - pos).toInt)
      if (n <= 0) return limit
      var i = 0
      while (i < n) {
        if (buf(i) == '\n') return pos + i + 1
        i += 1
      }
      pos += n
    }
    limit
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
      // Streaming line reader: a fixed chunk buffer + a carry for lines
      // spanning chunk boundaries. Peak heap = one chunk + the longest
      // line, regardless of range size. Both range ends are complete-line
      // boundaries, so the range parses into whole lines exactly.
      private val raf = new RandomAccessFile(p.path, "r")
      raf.seek(p.start)
      private var remaining = p.end - p.start
      private val buf = new Array[Byte](64 * 1024)
      private var bufPos = 0
      private var bufLen = 0
      private var filePos = p.start // byte offset of buf(bufPos)
      private var row: InternalRow = _

      private def fill(): Boolean = {
        if (remaining <= 0) return false
        val n = raf.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
        if (n <= 0) { remaining = 0; false }
        else { bufLen = n; bufPos = 0; remaining -= n; true }
      }

      override def next(): Boolean = {
        if (bufPos >= bufLen && !fill()) return false
        val lineStart = filePos
        var carry: java.io.ByteArrayOutputStream = null
        while (true) {
          var i = bufPos
          while (i < bufLen && buf(i) != '\n') i += 1
          if (i < bufLen) { // newline inside the buffered chunk
            val segLen = i - bufPos
            val utf =
              if (carry == null)
                UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, bufPos, i))
              else {
                carry.write(buf, bufPos, segLen)
                UTF8String.fromBytes(carry.toByteArray)
              }
            filePos += segLen + 1
            bufPos = i + 1
            row = InternalRow(lineStart, utf)
            return true
          }
          // line continues past this chunk: stash and refill
          if (carry == null) carry = new java.io.ByteArrayOutputStream()
          carry.write(buf, bufPos, bufLen - bufPos)
          filePos += bufLen - bufPos
          bufPos = bufLen
          if (!fill())
            throw new IllegalStateException(
              s"slotlog range [${p.start},${p.end}) of ${p.path} did not end on a " +
                "line boundary — offsets must come from planInputPartitions")
        }
        false // unreachable
      }
      override def get(): InternalRow = row
      override def close(): Unit = raf.close()
    }
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** A2 scale path: a large slotlog micro-batch splits across readers.
  * The contract under test: splitting is a pure physical decision —
  * any (maxBytesPerPartition, maxPartitions) setting yields the same
  * rows with the same slot cursors as the single-reader plan, ranges
  * are line-aligned and cover the batch exactly, and the per-reader
  * streaming buffer handles lines longer than one buffer chunk.
  */
class SlotLogSplitSpec extends SparkSpec {
  import spark.implicits._

  private def writeLog(path: String, lines: Seq[String]): Unit = {
    val w = new java.io.FileWriter(path, true)
    try lines.foreach(l => w.write(l + "\n")) finally w.close()
  }

  private def readAll(ranges: Array[org.apache.spark.sql.connector.read.InputPartition])
      : Seq[(Long, String)] = {
    val factory = new SlotLogReaderFactory
    ranges.flatMap { r =>
      val reader = factory.createReader(r)
      val out = Seq.newBuilder[(Long, String)]
      try
        while (reader.next()) {
          val row = reader.get()
          out += ((row.getLong(0), row.getUTF8String(1).toString))
        }
      finally reader.close()
      out.result()
    }.toSeq
  }

  test("planInputPartitions splits a batch into line-aligned covering ranges") {
    val tmp = Files.createTempDirectory("slotsplit").toString
    val log = s"$tmp/feed.jsonl"
    val lines = (1 to 500).map(i => s"""{"event_id": $i, "pad": "${"x" * 40}"}""")
    writeLog(log, lines)
    val len = new java.io.File(log).length()

    val stream = new SlotLogMicroBatchStream(log,
      maxBytesPerPartition = 2048, maxPartitions = 32)
    val parts = stream.planInputPartitions(SlotOffset(0L), SlotOffset(len))
    assert(parts.length > 4, s"a ${len}B batch at 2KiB budget must split, got ${parts.length}")

    val ranges = parts.map(_.asInstanceOf[SlotLogRange])
    // exact coverage, no overlap, in order
    assert(ranges.head.start == 0L && ranges.last.end == len)
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a.end == b.start, s"gap/overlap between $a and $b")
    case _ => ()
    }
    // every boundary is line-aligned: the byte before each internal
    // boundary is '\n'
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(log))
    ranges.tail.foreach(r =>
      assert(bytes(r.start.toInt - 1) == '\n', s"boundary ${r.start} not line-aligned"))
    // rows parse identically to the unsplit plan, slots preserved
    val single = readAll(Array(SlotLogRange(log, 0L, len)))
    assert(readAll(parts.map(x => x: org.apache.spark.sql.connector.read.InputPartition)) == single)
    assert(single.map(_._2) == lines)
  }

  test("a line longer than the reader's chunk buffer streams through the carry path") {
    val tmp = Files.createTempDirectory("slotcarry").toString
    val log = s"$tmp/feed.jsonl"
    val big = "B" * (200 * 1024) // ~3 chunk buffers
    val lines = Seq("first", big, "last")
    writeLog(log, lines)
    val len = new java.io.File(log).length()
    val got = readAll(Array(SlotLogRange(log, 0L, len)))
    assert(got.map(_._2) == lines, "the carried long line must arrive intact")
    assert(got.map(_._1) == Seq(0L, 6L, 6L + big.length + 1L), "slot = line start byte")
  }

  test("split options flow end-to-end: same results, kill-and-restart still lossless") {
    val tmp = Files.createTempDirectory("slotsplit-e2e").toString
    val log = s"$tmp/feed.jsonl"
    writeLog(log, (1 to 300).map(i => s"ev$i"))
    val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    def runOnce(): Unit = {
      val q = spark.readStream.format("slotlog")
        .option("path", log)
        .option("maxBytesPerPartition", "256") // force many readers per batch
        .option("maxPartitions", "8")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 300)
    writeLog(log, (301 to 400).map(i => s"ev$i"))
    runOnce() // new query, same checkpoint
    val vals = spark.read.parquet(out).select("value").as[String].collect()
    assert(vals.length == 400, s"split batches lost or re-delivered rows: ${vals.length}")
    assert(vals.toSet == (1 to 400).map(i => s"ev$i").toSet)
    val slots = spark.read.parquet(out).select("slot").as[Long].collect()
    assert(slots.distinct.length == 400, "slot cursors must stay unique under splitting")
  }

  test("invalid split options fail loudly") {
    val tmp = Files.createTempDirectory("slotbad").toString
    val log = s"$tmp/feed.jsonl"
    writeLog(log, Seq("x"))
    intercept[Exception] {
      spark.readStream.format("slotlog")
        .option("path", log).option("maxBytesPerPartition", "0").load()
    }
  }
}

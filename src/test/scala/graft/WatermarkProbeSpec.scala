package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams

/** Pins Spark's append-mode watermark boundary conventions, which the
  * `j3_late_drop_replay` oracle encodes:
  *  - a window EMITS (append mode) once `window.end <= watermark`
  *    (equality emits);
  *  - a late row is DROPPED iff `window.end <= watermark` — the row's own
  *    event time never matters once its window is still open (probe 2:
  *    ts < wm with window end > wm is KEPT).
  * If a Spark upgrade ever changed either boundary, these tests go red
  * before the oracle silently diverges.
  */
class WatermarkProbeSpec extends SparkSpec {
  private def ts(s: Long) = new Timestamp(s * 1000)

  test("probe: append-mode emit and late-drop boundary equality") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = EventStreams.tumblingCounts(
      in.toDF().toDF("ts", "event_type", "value"), "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("probe")
      .outputMode(OutputMode.Append).start()
    try {
      // b1: window [2700,3000) via "x", and max event time 3600 -> wm = 3000
      in.addData((ts(2890), "x", 1.0), (ts(3600), "a", 1.0))
      q.processAllAvailable()
      val afterB1 = spark.table("probe")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1))).toSet
      println(s"[probe] after b1 (wm=3000): $afterB1")

      // b2: same window via "y": end 3000 == wm 3000 exactly
      in.addData((ts(2895), "y", 1.0))
      q.processAllAvailable()

      // b3: advance wm to 6600, flush everything closed
      in.addData((ts(7200), "a", 1.0))
      q.processAllAvailable()
      val fin = spark.table("probe")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1))).toSet
      println(s"[probe] final (wm=6600): $fin")
      println(s"[probe] emit-at-equality(end==wm emits): ${afterB1.contains((2700L, "x"))}")
      println(s"[probe] drop-at-equality(end==wm row kept): ${fin.contains((2700L, "y"))}")
    } finally q.stop()
  }

  test("probe: file-replay watermark lag (batches back-to-back, no idle trigger)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (0, ts(3600), "a", 1.0),
      (1, ts(10), "b", 1.0), (1, ts(7200), "a", 1.0),
      (2, ts(6500), "c", 1.0),
      // lag-2 at b3 would filter vs wm = maxts(b1) − 600 = 6600 and drop
      // this (end 6300 ≤ 6600); a frozen-during-replay wm keeps it
      (3, ts(6000), "d", 1.0),
      (4, ts(20000), "a", 1.0)
    ).toDF("b", "ts", "event_type", "value")
    val in = analytics.StreamingReplay.stageBatches(rows, col("b"), 5)
    val schema = spark.read.parquet(in).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val agg = EventStreams.tumblingCounts(src, "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("probe3")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("probe3ck").toString)
      .start()
    try {
      q.processAllAvailable()
      val fin = spark.table("probe3")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1))).toSet
      println(s"[probe] file-replay final: $fin")
      // pinned LAG-2: the filter for batch k uses event-time stats
      // through batch k−2 (batch k's offsets are planned before batch
      // k−1's stats fold into the watermark). The j3_late_drop_replay
      // oracle encodes exactly this.
      assert(fin.contains((0L, "b")), "b1 filtered vs NULL wm (lag 2)")
      assert(fin.contains((6300L, "c")), "b2 filtered vs b0 stats only (lag 2)")
      assert(!fin.contains((6000L, "d")),
        "b3 must filter vs maxts(b1) − delay = 6600 (lag exactly 2, not frozen)")
    } finally q.stop()
  }

  /** Pins the round-12 replay optimization's premise: for the INNER
    * interval join and the watermarked dedup, output emits at ARRIVAL
    * (match time / first-seen time), never at a watermark crossing — so
    * skipping the trailing no-data micro-batches
    * (`spark.sql.streaming.noDataMicroBatches.enabled=false`, as
    * j8/j9's replays do) cannot change the result set. If a Spark
    * upgrade ever moved either operator's emission to the watermark,
    * this differential goes red before the oracle does.
    */
  test("probe: no-data micro-batches do not change inner-join or dedup results") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val buys = Seq((0, 10L, ts(1000)), (1, 11L, ts(2000)), (0, 12L, ts(9000)))
      .toDF("b", "user_id", "bts")
    val clicks = Seq((0, 10L, ts(900)), (1, 10L, ts(950)), (0, 11L, ts(1990)),
      (1, 12L, ts(8990)), (0, 99L, ts(1.0.toLong)))
      .toDF("b", "user_id", "cts")
    def run(noData: Boolean): (Set[(Long, Long, Long)], Set[(Long, String)]) = {
      val key = "spark.sql.streaming.noDataMicroBatches.enabled"
      val prev = spark.conf.get(key)
      spark.conf.set(key, noData.toString)
      try {
        val inL = analytics.StreamingReplay.stageBatches(
          buys.withColumnRenamed("bts", "ts"), col("b"), 2)
        val inR = analytics.StreamingReplay.stageBatches(
          clicks.select(col("b"), col("user_id"), col("cts")), col("b"), 2)
        def srcOf(in: String) = spark.readStream
          .schema(spark.read.parquet(in).schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val joined = EventStreams.intervalJoin(
          left = srcOf(inL).drop("b"), right = srcOf(inR).drop("b"),
          keyCol = "user_id", leftTs = "ts", rightTs = "cts",
          valueCols = Nil, lookback = "5 minutes", watermark = "60 days")
        val qn = s"probe_nd_join_$noData"
        val q = joined.writeStream.format("memory").queryName(qn)
          .outputMode(OutputMode.Append)
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("probend").toString)
          .start()
        val pairs = try {
          q.processAllAvailable()
          spark.table(qn).collect().map(r =>
            (r.getAs[Long]("user_id"),
              r.getAs[Timestamp]("ts").getTime / 1000,
              r.getAs[Timestamp]("r_cts").getTime / 1000)).toSet
        } finally q.stop()

        val events = Seq((0, 10L, "click", ts(100)), (1, 10L, "click", ts(200)),
          (0, 10L, "buy", ts(300)), (1, 11L, "click", ts(400)))
          .toDF("b", "user_id", "event_type", "ts")
        val inD = analytics.StreamingReplay.stageBatches(events, col("b"), 2)
        val src = spark.readStream.schema(spark.read.parquet(inD).schema)
          .option("maxFilesPerTrigger", 1).parquet(inD)
          .select(concat_ws(":", col("user_id"), col("event_type")).as("k"),
            col("user_id"), col("event_type"), col("ts"))
        val dd = EventStreams.streamingDedup(src, "k", "ts", "60 days")
        val qn2 = s"probe_nd_dedup_$noData"
        val q2 = dd.writeStream.format("memory").queryName(qn2)
          .outputMode(OutputMode.Append)
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("probend2").toString)
          .start()
        val keys = try {
          q2.processAllAvailable()
          spark.table(qn2).collect().map(r =>
            (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).toSet
        } finally q2.stop()
        (pairs, keys)
      } finally spark.conf.set(key, prev)
    }
    val (pOn, kOn) = run(noData = true)
    val (pOff, kOff) = run(noData = false)
    assert(pOn == pOff, s"interval-join pairs diverged:\n$pOn\nvs\n$pOff")
    assert(kOn == kOff, s"dedup keys diverged:\n$kOn\nvs\n$kOff")
    assert(pOn.nonEmpty && kOn.nonEmpty)
  }

  test("probe: row with ts < wm but window end > wm") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = EventStreams.tumblingCounts(
      in.toDF().toDF("ts", "event_type", "value"), "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("probe2")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(3610), "a", 1.0)) // wm -> 3010 (NOT window-aligned)
      q.processAllAvailable()
      // ts=3005 < wm=3010, but window [3000,3300) end 3300 > wm
      in.addData((ts(3005), "z", 1.0))
      q.processAllAvailable()
      in.addData((ts(9000), "a", 1.0)) // flush
      q.processAllAvailable()
      val fin = spark.table("probe2")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1))).toSet
      println(s"[probe] final2: $fin")
      println(s"[probe] kept-when-ts<wm-but-window-open: ${fin.contains((3000L, "z"))}")
    } finally q.stop()
  }
}

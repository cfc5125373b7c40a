package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Position, PositionEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files
import java.sql.Timestamp

/** J1–J5 (SURVEY.md §2.J): windowed aggregation under incremental arrival,
  * exactly-once sink under batch replay, stateful running position.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("J3/J4: tumbling window counts accumulate across micro-batches; late row beyond watermark dropped") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val stream = in.toDF().toDF("ts", "event_type", "value")
    val agg = EventStreams.tumblingCounts(stream, "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((ts(0), "a", 1.0), (ts(60), "a", 2.0), (ts(301), "b", 5.0))
      q.processAllAvailable()
      // advance event time far beyond watermark, then send a too-late row
      in.addData((ts(7200), "a", 1.0))
      q.processAllAvailable()
      in.addData((ts(10), "a", 99.0)) // 2h late vs max event time — dropped
      q.processAllAvailable()
      val out = spark.table("tumbling")
        .groupBy("w_start", "event_type")
        .agg(max("cnt").as("cnt"), max("sum_val").as("sum_val"))
        .as[(Timestamp, String, Long, Double)].collect()
        .map { case (w, e, c, s) => ((w.getTime / 1000, e), (c, s)) }.toMap
      assert(out((0L, "a")) == (2L, 3.0), "late row beyond watermark must not update the window")
      assert(out((300L, "b")) == (1L, 5.0))
      assert(out((7200L, "a")) == (1L, 1.0))
    } finally q.stop()
  }

  test("J4: session windows split on gap > 5 minutes per user") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val stream = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val agg = EventStreams.sessionCounts(stream, "5 minutes", "10 minutes")
    // session windows only support Append: sessions emit once finalized
    // (watermark passed their end)
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 1 min apart (one session), then one 20 min later
      in.addData((ts(0), 1L, "a", 1.0), (ts(60), 1L, "a", 1.0), (ts(1260), 1L, "a", 1.0))
      q.processAllAvailable()
      in.addData((ts(7200), 9L, "a", 1.0)) // advance watermark to close sessions
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .groupBy("s_start", "user_id").agg(max("n_events").as("n_events"))
        .filter($"user_id" === 1)
        .as[(Timestamp, Long, Long)].collect()
        .map { case (s, _, n) => (s.getTime / 1000, n) }.toSet
      assert(sessions == Set((0L, 2L), (1260L, 1L)),
        s"expected two sessions, got $sessions")
    } finally q.stop()
  }

  test("J2: exactly-once sink deduplicates replayed events by key") {
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("eos").toString
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.exactlyOnceSink(
      in.toDF().toDF("event_id", "payload"),
      s"$tmp/table", s"$tmp/ckpt", "event_id")
    try {
      in.addData((1L, "x"), (2L, "y"))
      q.processAllAvailable()
      in.addData((2L, "y"), (3L, "z")) // replay of key 2
      q.processAllAvailable()
      val state = spark.read.parquet(s"$tmp/table")
        .as[(Long, String)].collect().sorted.toSeq
      assert(state == Seq((1L, "x"), (2L, "y"), (3L, "z")))
    } finally q.stop()
  }

  test("J5: stateful running position folds per-user across micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[PositionEvent]
    val q = EventStreams.runningPosition(in.toDS())
      .writeStream.format("memory").queryName("positions")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(PositionEvent(1, 10.0), PositionEvent(1, -3.0), PositionEvent(2, 5.0))
      q.processAllAvailable()
      in.addData(PositionEvent(1, 1.0))
      q.processAllAvailable()
      val latest = spark.table("positions").as[Position].collect()
        .groupBy(_.user_id).map { case (u, ps) => u -> ps.maxBy(_.n_events) }
      assert(latest(1L) == Position(1, 8.0, 3))
      assert(latest(2L) == Position(2, 5.0, 1))
    } finally q.stop()
  }

  test("J5: flatMap position alerts emit only on threshold crossings") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[PositionEvent]
    val q = EventStreams.positionAlerts(in.toDS(), threshold = 10.0)
      .writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(PositionEvent(1, 6.0), PositionEvent(2, 3.0))
      q.processAllAvailable() // nobody crossed
      in.addData(PositionEvent(1, 7.0)) // user 1 crosses to 13
      q.processAllAvailable()
      in.addData(PositionEvent(1, 1.0)) // still above: no re-alert
      q.processAllAvailable()
      val alerts = spark.table("alerts").as[Position].collect().toSeq
      assert(alerts == Seq(Position(1, 13.0, 2)))
    } finally q.stop()
  }

  test("J1: subscribe reads the raw nanos-timestamped events parquet directly") {
    // the corpus events.parquet is TIMESTAMP(NANOS): subscribe must handle
    // it without a prior Tables.events call having mutated the session
    // conf. Raw byte copy into a dir (file streams need directories).
    val dir = Files.createTempDirectory("rawsub")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"))
    val stream = EventStreams.subscribe(spark, dir.toString)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val q = stream.writeStream.format("memory").queryName("rawsub")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("rawsub").count() ==
        Tables.events(spark, sfDir).count())
    } finally q.stop()
  }

  test("I1×J: the batch normalizer runs unchanged on a streaming bronze source") {
    import graft.analytics.LedgerQueries
    import graft.normalize.SolanaNormalizer
    val tmp = Files.createTempDirectory("snorm").toString
    LedgerQueries.fixtureBronze(spark).coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val bronzeStream = spark.readStream
      .schema(graft.model.Schemas.bronze).parquet(tmp)
    val silverStream = SolanaNormalizer.normalize(bronzeStream)
    assert(silverStream.isStreaming)
    val q = silverStream.writeStream.format("memory").queryName("silver_stream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("silver_stream")
        .select("transaction_id", "asset_symbol", "amount").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      val batch = SolanaNormalizer.normalize(LedgerQueries.fixtureBronze(spark))
        .select("transaction_id", "asset_symbol", "amount").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == batch, "streaming and batch normalization must agree")
      assert(got.contains(("tx1", "SOL", -0.5)))
    } finally q.stop()
  }

  test("J4 boundary: an event at EXACTLY the session gap merges; one second past splits") {
    val df = Seq(
      (ts(3600), 1L),              // session start
      (ts(3600 + 1800), 1L),       // exactly 30 min later → must MERGE
      (ts(3600 + 1800 + 1801), 1L) // 30 min + 1 s later → new session
    ).toDF("ts", "user_id")
    val sessions = df
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count().collect()
    assert(sessions.length == 2,
      s"session merge is inclusive at the gap boundary: $sessions")
  }

  test("J2: in-stream watermarked dedup collapses replayed keys before any sink") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val stream = in.toDF().toDF("ts", "event_id", "value")
    val deduped = EventStreams.streamingDedup(stream, "event_id", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      // timestamps clear of epoch 0: a row with ts == the initial watermark
      // (0) is dropped as late before dedup even sees it
      in.addData((ts(3600), 1L, 1.0), (ts(3610), 2L, 2.0))
      q.processAllAvailable()
      // replay batch 1's keys (at-least-once delivery) plus one new key
      in.addData((ts(3600), 1L, 1.0), (ts(3610), 2L, 2.0), (ts(3620), 3L, 3.0))
      q.processAllAvailable()
      val got = spark.table("stream_dedup")
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L), s"replayed keys must collapse: $got")
    } finally q.stop()
  }

  test("J-EXT: stream-static join enriches a stream with a broadcastable dimension") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val enriched = in.toDF().toDF("ts", "user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
    val q = enriched.writeStream.format("memory").queryName("stream_static")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(3600), 1L, 5.0), (ts(3610), 3L, 7.0))
      q.processAllAvailable()
      val got = spark.table("stream_static")
        .select("user_id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("gold"), 3L -> None),
        s"static dim must enrich per micro-batch: $got")
    } finally q.stop()
  }

  test("J-EXT: stream-stream interval join pairs events within the lookback only") {
    implicit val sc = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    val clicks = MemoryStream[(Timestamp, Long, Double)]
    val joined = EventStreams.intervalJoin(
      purchases.toDF().toDF("ts", "user_id", "value"),
      clicks.toDF().toDF("ts", "user_id", "value"),
      "user_id", "ts", "ts", Seq("value"),
      lookback = "10 minutes", watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("interval_join")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: clicks at t+0s and t+700s, purchase at t+720s → only the
      // click 20 s before (within 10 min) joins, not the one 12 min before.
      // user 2: click only, no purchase → no output row.
      clicks.addData((ts(3600), 1L, 0.1), (ts(4300), 1L, 0.2), (ts(4000), 2L, 0.3))
      purchases.addData((ts(4320), 1L, 9.9))
      q.processAllAvailable()
      val got = spark.table("interval_join")
        .select("user_id", "value", "r_value")
        .as[(Long, Double, Double)].collect().toSet
      assert(got == Set((1L, 9.9, 0.2)),
        s"expected only the in-window click to join: $got")
    } finally q.stop()
  }

  test("J-EXT: salted interval join is row-identical to the plain join on a skewed corpus") {
    // 90% of events on one hot key — the shape where the plain join
    // concentrates all state/pair work in one partition. The salted
    // variant must change ONLY placement, never the pair set.
    val n = 4000L
    val Hot = 777L
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      timestamp_seconds(lit(1700000000L) + col("id") / 2).as("ts"),
      when(pmod(col("id"), lit(10)) < 9, lit(Hot))
        .otherwise(pmod(col("id"), lit(99)) + 1000).as("user_id"),
      when(pmod(col("id"), lit(2)) === 0, lit("click"))
        .otherwise(lit("purchase")).as("event_type"))
      .localCheckpoint(true)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val inL = graft.analytics.StreamingReplay.stageBatches(
      buys, pmod(col("buy_id"), lit(4)).cast("int"), 2)
    val inR = graft.analytics.StreamingReplay.stageBatches(
      clicks, pmod(col("click_id"), lit(4)).cast("int"), 2)
    def srcOf(in: String) = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    def pairs(salted: Boolean): Set[(Long, Long)] = {
      val joined =
        if (salted) EventStreams.intervalJoinSalted(
          srcOf(inL), srcOf(inR), "user_id", "ts", "ts", Seq("click_id"),
          lookback = "10 seconds", watermark = "60 days",
          hotKeys = Seq(Hot), salts = 4)
        else EventStreams.intervalJoin(
          srcOf(inL), srcOf(inR), "user_id", "ts", "ts", Seq("click_id"),
          lookback = "10 seconds", watermark = "60 days")
      val qn = s"salt_parity_${if (salted) "s" else "p"}_${System.nanoTime()}"
      val q = joined.writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append)
        .option("checkpointLocation",
          Files.createTempDirectory("saltck").toString)
        .start()
      try {
        q.processAllAvailable()
        spark.table(qn).select("buy_id", "r_click_id")
          .as[(Long, Long)].collect().toSet
      } finally q.stop()
    }
    val plain = pairs(salted = false)
    val salted = pairs(salted = true)
    assert(plain.nonEmpty, "skewed corpus produced no pairs")
    assert(salted == plain,
      s"salting changed the pair set: ${salted.size} vs ${plain.size} — " +
        s"only-salted=${(salted -- plain).take(3)} only-plain=${(plain -- salted).take(3)}")
  }

  test("I1×J×G1: the multi-chain dispatch union runs unchanged on a streaming bronze source") {
    import graft.analytics.LedgerQueries
    import graft.normalize.ChainNormalizers
    val tmp = Files.createTempDirectory("mcnorm").toString
    LedgerQueries.mixedBronze(spark).coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val bronzeStream = spark.readStream
      .schema(graft.model.Schemas.bronze).parquet(tmp)
    val silverStream = ChainNormalizers.normalizeAll(bronzeStream)
    assert(silverStream.isStreaming)
    val q = silverStream.writeStream.format("memory").queryName("mc_silver_stream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("mc_silver_stream")
        .select("transaction_id", "asset_symbol", "amount").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      val batch = ChainNormalizers.normalizeAll(LedgerQueries.mixedBronze(spark))
        .select("transaction_id", "asset_symbol", "amount").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == batch, "streaming and batch multi-chain normalization must agree")
      assert(got.contains(("eth1", "ETH", 1.5)) && got.contains(("eth2", "ETH", -0.25)))
    } finally q.stop()
  }

  test("J1: streaming subscribe over events dir with pushed filter sees only requested types") {
    val tmp = Files.createTempDirectory("sub").toString
    Tables.events(spark, sfDir).limit(200).write.mode("overwrite").parquet(tmp)
    val stream = EventStreams.subscribe(spark, tmp, Seq("click"))
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("sub")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val types = spark.table("sub").select("event_type").distinct()
        .as[String].collect().toSet
      assert(types.subsetOf(Set("click")))
      assert(spark.table("sub").count() ==
        spark.read.parquet(tmp).filter($"event_type" === "click").count())
    } finally q.stop()
  }

  test("K2xJ: streaming corpus ingest rejects near-dups across micro-batches, replay is a no-op") {
    import graft.streaming.CorpusIngest
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("ingest").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the deep dark forest where nobody ever goes at night"
    val novel = "completely different text about spark catalyst optimizer " +
      "rules and tungsten codegen for columnar execution at scale today"
    val in = MemoryStream[(Long, String)]
    val q = CorpusIngest.dedupingSink(
      in.toDF().toDF("doc_id", "text"),
      s"$tmp/corpus", s"$tmp/index", s"$tmp/ckpt", "text", "doc_id",
      threshold = 0.4)
    try {
      // batch 1: two originals + an in-batch exact dup of doc 1
      in.addData((1L, base), (2L, novel), (3L, base))
      q.processAllAvailable()
      val after1 = spark.read.parquet(s"$tmp/corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(1L, 2L), s"in-batch exact dup must collapse: $after1")
      // batch 2: near-dup of an INDEXED doc (one-word edit) + a fresh doc
      in.addData((10L, base.replace("lazy", "sleepy")), (11L,
        "yet another unrelated document mentioning minhash signatures " +
          "banded locality sensitive hashing and jaccard similarity"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(s"$tmp/corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(1L, 2L, 11L),
        s"cross-batch near-dup must be rejected via the index: $after2")
      // index carries exactly the accepted docs' signatures
      val idx = spark.read.parquet(s"$tmp/index")
        .select("doc_id").as[Long].collect().toSet
      assert(idx == after2, s"index out of sync with corpus: $idx")
      // replaying an already-ingested batch is a no-op (idempotent appends)
      val n = CorpusIngest.ingestBatch(
        Seq((10L, base.replace("lazy", "sleepy")), (11L, novel + " v2"))
          .toDF("doc_id", "text"),
        s"$tmp/corpus", s"$tmp/index", "text", "doc_id", threshold = 0.4)
      assert(n == 0, s"replayed keys must not re-insert, appended $n")
      assert(spark.read.parquet(s"$tmp/corpus").count() == 3)
    } finally q.stop()
  }

  test("K2xJ: ingest rejects a cross-batch EXACT dup of a sub-shingle doc via the digest index") {
    import graft.streaming.CorpusIngest
    val tmp = Files.createTempDirectory("ingest-short").toString
    // two tokens < shingleN=3: invisible to the MinHash signature path —
    // before the digest index, this dup was admitted (documented gap).
    val short = "tiny doc"
    assert(CorpusIngest.ingestBatch(
      Seq((1L, short)).toDF("doc_id", "text"),
      s"$tmp/corpus", s"$tmp/index", "text", "doc_id") == 1L)
    val n = CorpusIngest.ingestBatch(
      Seq((2L, short), (3L, "a genuinely new document with enough words " +
        "to shingle and sign for the minhash index path")).toDF("doc_id", "text"),
      s"$tmp/corpus", s"$tmp/index", "text", "doc_id")
    assert(n == 1L, s"exact short dup must be rejected cross-batch, accepted $n")
    val ids = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L), s"corpus must hold the original + the novel doc: $ids")
    // the digest sub-table is invisible to a parquet read of the index
    // (underscore convention), and stays in sync with the corpus
    val digests = spark.read.parquet(s"$tmp/index/_digests")
      .select("doc_id").as[Long].collect().toSet
    assert(digests == ids, s"digest index out of sync: $digests")
  }

  test("K2xJ: crashed-ingest lock fails replays loudly until recoverIngestLock, then heals") {
    import graft.streaming.CorpusIngest
    import graft.operators.IdempotentSink.ConcurrentWriteException
    val tmp = Files.createTempDirectory("ingest-crash").toString
    val doc = Seq((1L, "a perfectly ordinary document with enough words " +
      "to shingle and sign for the minhash index path")).toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(doc, s"$tmp/corpus", s"$tmp/index",
      "text", "doc_id") == 1L)
    // simulate a writer that died inside the ingest scope: its lock file
    // survives (withTableLock never auto-expires locks)
    val stale = new java.io.File(s"$tmp/index/_ingest/_graft_write_lock")
    stale.getParentFile.mkdirs()
    java.nio.file.Files.write(stale.toPath,
      "pid=999999 epochMs=0 nonce=dead".getBytes)
    val replay = Seq((2L, "another document that the replayed batch " +
      "carries after the crash with plenty of words")).toDF("doc_id", "text")
    intercept[ConcurrentWriteException] {
      CorpusIngest.ingestBatch(replay, s"$tmp/corpus", s"$tmp/index",
        "text", "doc_id")
    }
    // the documented recovery: confirm dead, break the scoped lock, replay
    assert(CorpusIngest.recoverIngestLock(spark, s"$tmp/index"),
      "a stale lock must be present and removed")
    assert(CorpusIngest.ingestBatch(replay, s"$tmp/corpus", s"$tmp/index",
      "text", "doc_id") == 1L)
    assert(spark.read.parquet(s"$tmp/corpus").count() == 2)
    assert(spark.read.parquet(s"$tmp/index")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L),
      "index must hold both docs' signatures after the healed replay")
  }

  test("J4+: stream-stream interval join attributes purchases to in-window clicks only") {
    implicit val sc = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Timestamp, Double)]
    val purchasesIn = MemoryStream[(Long, Long, Timestamp, Double)]
    val clicks = clicksIn.toDF().toDF("user_id", "ts", "value")
    val purchases = purchasesIn.toDF().toDF("event_id", "user_id", "ts", "value")
    val joined = EventStreams.purchaseAttribution(purchases, clicks,
      lookback = "10 minutes", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attribution")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: click at t=0 and t=500 before a purchase at t=600
      //   → t=500 is in the 10-min lookback, t=0 is not
      // user 2: click AFTER its purchase → no match
      clicksIn.addData((1L, ts(0), 1.0), (1L, ts(500), 2.0), (2L, ts(700), 3.0))
      purchasesIn.addData((10L, 1L, ts(600), 9.0), (20L, 2L, ts(650), 8.0))
      q.processAllAvailable()
      val got = spark.table("attribution")
        .select("purchase_id", "user_id", "click_ts", "click_value")
        .as[(Long, Long, Timestamp, Double)].collect()
        .map { case (p, u, t, v) => (p, u, t.getTime / 1000, v) }.toSet
      assert(got == Set((10L, 1L, 500L, 2.0)),
        s"only the in-window same-user click may attribute: $got")
      // a second purchase by user 1 inside the window of the SAME click
      // still matches (stream-stream state holds the click until the
      // watermark passes its horizon)
      purchasesIn.addData((11L, 1L, ts(800), 7.0))
      q.processAllAvailable()
      val got2 = spark.table("attribution")
        .select("purchase_id").as[Long].collect().toSet
      assert(got2 == Set(10L, 11L), s"buffered click must re-match: $got2")
    } finally q.stop()
  }

  test("A2/J1: slotlog kill-and-restart resumes from the checkpointed cursor — nothing lost, nothing re-delivered") {
    val tmp = Files.createTempDirectory("slotlog").toString
    val log = s"$tmp/events.jsonl"
    def append(ids: Range, withCorrupt: Boolean = false): Unit = {
      val w = new java.io.FileWriter(log, true)
      try {
        ids.foreach { i =>
          w.write(s"""{"event_id": $i, "ts": ${1704067200000000L + i * 1000000L}, """ +
            s""""user_id": ${i % 5}, "event_type": "click", "value": 1.0, "props": "{}"}""" + "\n")
        }
        if (withCorrupt) w.write("this line is not json and must be skipped\n")
      } finally w.close()
    }
    append(1 to 50)
    val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    // PLAIN file sink on purpose: it does not dedupe rows, so if the source
    // re-delivered any range after restart the duplicates would be visible.
    def runOnce(): Unit = {
      val q = EventStreams.subscribeSlotLog(spark, log)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 50)
    append(51 to 100, withCorrupt = true)
    runOnce() // NEW query instance, same checkpoint: must resume after event 50
    val ids = spark.read.parquet(out).select("event_id").as[Long].collect()
    assert(ids.length == 100, s"resume lost or re-delivered rows: ${ids.length}")
    assert(ids.toSet == (1 to 100).map(_.toLong).toSet,
      "every event must appear exactly once across the restart")
    val slots = spark.read.parquet(out).orderBy("event_id")
      .select("slot").as[Long].collect()
    assert(slots.distinct.length == 100 && slots.sliding(2).forall(p => p(0) < p(1)),
      "slot cursors must be unique and monotone in event order across the restart")
  }

  test("A2×J2: an at-least-once producer's re-sent records collapse in the idempotent sink") {
    // the full reference pipeline shape: a live feed that re-delivers
    // after a producer crash (Yellowstone re-sends from its last slot)
    // into the ON-CONFLICT-DO-NOTHING sink — the table must stay
    // exactly-once even though the LOG genuinely contains duplicates
    val tmp = Files.createTempDirectory("slotlog-alo").toString
    val log = s"$tmp/feed.jsonl"
    def append(ids: Seq[Int]): Unit = {
      val w = new java.io.FileWriter(log, true)
      try ids.foreach { i =>
        w.write(s"""{"event_id": $i, "ts": ${1704067200000000L + i * 1000000L}, """ +
          s""""user_id": ${i % 3}, "event_type": "click", "value": 1.0, "props": "{}"}""" + "\n")
      } finally w.close()
    }
    append(1 to 20)
    append(15 to 20) // producer crash: re-sends its unacked tail
    append(21 to 25)
    val q = EventStreams.exactlyOnceSink(
      EventStreams.subscribeSlotLog(spark, log).drop("slot"),
      s"$tmp/table", s"$tmp/ckpt", "event_id")
    try {
      q.processAllAvailable()
      val ids = spark.read.parquet(s"$tmp/table")
        .select("event_id").as[Long].collect()
      assert(ids.length == 25 && ids.toSet == (1 to 25).map(_.toLong).toSet,
        s"duplicated wire records must collapse at the sink: ${ids.sorted.toSeq}")
    } finally q.stop()
  }

  test("A2: a torn (unterminated) tail line is invisible until its newline lands") {
    val tmp = Files.createTempDirectory("slotlog-torn").toString
    val log = s"$tmp/feed.jsonl"
    def write(s: String): Unit = {
      val w = new java.io.FileWriter(log, true)
      try w.write(s) finally w.close()
    }
    write("alpha\nbet") // "bet" is a producer's half-written record
    val q = spark.readStream.format("slotlog").option("path", log).load()
      .writeStream.format("memory").queryName("torn")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("torn").select("value").as[String].collect().toSeq
        == Seq("alpha"), "a torn tail line must not be served")
      write("a\n") // the record completes: now it must arrive, intact
      q.processAllAvailable()
      assert(spark.table("torn").orderBy("slot").select("value").as[String]
        .collect().toSeq == Seq("alpha", "beta"),
        "the completed record must arrive whole, never as fragments")
    } finally q.stop()
  }

  test("J1: socket subscription parses JSONL events, skips corrupt lines, filters types") {
    // live-connector stand-in: a local server pushes JSON lines the way a
    // gRPC subscription would push protobuf events
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val lines = Seq(
      """{"event_id": 1, "ts": 1704067200000000, "user_id": 7, "event_type": "click", "value": 1.5, "props": "{}"}""",
      """this line is not json and must be skipped""",
      """{"event_id": 2, "ts": 1704067260000000, "user_id": 8, "event_type": "purchase", "value": 9.0, "props": "{}"}""",
      """{"event_id": 3, "ts": 1704067320000000, "user_id": 7, "event_type": "view", "value": 0.5, "props": "{}"}""")
    val feeder = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      // keep the connection open until the query is done reading; the
      // socket source treats EOF as stream end
      Thread.sleep(30000)
      sock.close()
    })
    feeder.setDaemon(true)
    feeder.start()
    val stream = EventStreams.subscribeSocket(spark,
      java.net.InetAddress.getLoopbackAddress.getHostAddress,
      server.getLocalPort, eventTypes = Seq("click", "purchase"))
    val q = stream.writeStream.format("memory").queryName("socket_events")
      .outputMode(OutputMode.Append).start()
    try {
      val deadline = System.currentTimeMillis + 30000
      var n = 0L
      while (n < 2 && System.currentTimeMillis < deadline) {
        q.processAllAvailable()
        n = spark.table("socket_events").count()
      }
      val got = spark.table("socket_events")
        .select("event_id", "user_id", "event_type", "value")
        .as[(Long, Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 7L, "click", 1.5), (2L, 8L, "purchase", 9.0)),
        s"socket stream parsed wrong rows: $got")
      val tsVals = spark.table("socket_events")
        .select("ts").as[java.sql.Timestamp].collect().map(_.getTime).sorted
      assert(tsVals.head == 1704067200000L,
        "epoch-micros ts must normalize to the file replay's TimestampType")
    } finally { q.stop(); server.close() }
  }

  test("streaming CM sketch: maintained across micro-batches equals one-shot; restart replay cannot double-count") {
    implicit val sc = spark.sqlContext
    import graft.operators.{SketchMaintenance => SM}
    val depth = 4
    val width = 128
    val statePath = Files.createTempDirectory("cm_stream_state").toString
    val ckpt = Files.createTempDirectory("cm_stream_ckpt").toString
    val in = MemoryStream[String]
    val q = graft.streaming.CorpusIngest.sketchSink(
      in.toDF().toDF("k"), statePath, ckpt, "k", depth, width)
    try {
      in.addData("a", "b", "a")
      q.processAllAvailable()
      in.addData("b", "c")
      q.processAllAvailable()
      val (_, _, counters) = SM.read(spark, statePath).get
      val oneShot = SM.batchPartial(
        Seq("a", "b", "a", "b", "c").toDF("k"), col("k"), depth, width)
      assert(counters.toSeq == oneShot.toSeq,
        "streamed sketch must equal the one-shot sketch bit-for-bit")
      // a replay of the LAST micro-batch (what checkpoint recovery does)
      // must be a no-op — this is the batch-id guard under the streaming
      // contract
      val replay = SM.update(spark, statePath, Seq("b", "c").toDF("k"),
        col("k"), depth, width, batchId = Some(1L))
      assert(replay.toSeq == oneShot.toSeq, "replayed batch must not double-count")
      assert(graft.functions.CountMinAggregator
        .estimate(replay.toIndexedSeq, "a", depth, width) == 2L)
    } finally q.stop()
  }

  test("J1: Trigger.AvailableNow drains the file subscription fully, then terminates on its own") {
    // the modern batch-drain trigger production schedulers use (run a
    // streaming pipeline as a self-terminating batch job with streaming
    // checkpoints intact): the query must consume EVERYTHING present at
    // start — across multiple maxFilesPerTrigger micro-batches — then
    // stop without external processAllAvailable/stop driving
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("avnow").toString
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts")
    (0 until 3).foreach { i =>
      ev.filter(pmod(col("event_id"), lit(3)) === i).coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val stream = EventStreams.subscribe(spark, dir, Seq("click", "purchase"))
      .select("event_id")
    val q = stream.writeStream.format("memory").queryName("avnow")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", Files.createTempDirectory("avnow_ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    val got = spark.table("avnow").count()
    val expect = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase")).count()
    assert(got == expect, s"drained $got of $expect rows")
  }
}

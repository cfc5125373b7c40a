package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.operators.IdempotentSink

/** J1–J5: Structured Streaming re-foundation of the reference's declared
  * streaming intent (`/root/reference/README.md:3` — Yellowstone gRPC
  * subscription, stubbed at `adapters/src/solana_grpc.rs:17-24`).
  *
  * Offsets ≙ slots: a file/parquet source's ordered batches stand in for
  * the slot stream; every transform below is identical on a real gRPC
  * source because Structured Streaming separates source from plan.
  */
object EventStreams {

  /** J1: subscribe — streaming read over an events directory with the
    * events schema; server-side filtering ≙ pushed filter on the stream.
    */
  def subscribe(spark: SparkSession, dir: String, eventTypes: Seq[String] = Nil): DataFrame = {
    // TIMESTAMP(NANOS) columns are detected from the parquet FOOTER (exact
    // logical-type check — no conf flipping that could race a live nanos
    // stream, no exception-message sniffing, no misreading plain epoch
    // longs as nanoseconds). If any column is nanos, nanosAsLong must be ON
    // for the stream's lifetime (per-batch reads consult the session conf);
    // a nanos `ts` is additionally converted ns→µs to TimestampType. Other
    // nanos columns surface as raw longs — documented limitation.
    val nanosCols = nanosColumns(spark, dir)
    if (nanosCols.nonEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    val stream =
      if (nanosCols.contains("ts"))
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else if (schema.fields.exists(f =>
        f.name == "ts" && f.dataType == org.apache.spark.sql.types.TimestampNTZType))
        // micros-NTZ producer: cast to TimestampType — exact under the
        // engine's UTC session zone, and keeps watermarks/windows uniform
        // across producers (they require an instant-typed event time).
        raw.withColumn("ts", col("ts").cast("timestamp"))
      else raw
    if (eventTypes.isEmpty) stream
    else stream.filter(col("event_type").isin(eventTypes.map(lit(_)): _*))
  }

  /** Names of top-level columns stored as parquet TIMESTAMP(NANOS), read
    * from the footer of the first parquet file under `dir`.
    */
  private[streaming] def nanosColumns(spark: SparkSession, dir: String): Set[String] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    val first = {
      val it = fs.listFiles(path, true)
      var found: Option[org.apache.hadoop.fs.Path] = None
      while (found.isEmpty && it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) found = Some(f.getPath)
      }
      found
    }
    first.fold(Set.empty[String]) { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
          case t if Option(t.getLogicalTypeAnnotation).exists {
            case ts: TimestampLogicalTypeAnnotation =>
              ts.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          } => t.getName
        }.toSet
      } finally reader.close()
    }
  }

  /** J1 (live-connector variant): subscribe to a SOCKET feeding JSONL
    * events — the closest zero-dependency stand-in for the reference's
    * intended gRPC subscription (`adapters/src/solana_grpc.rs:8-24`, a
    * stub there too): a long-lived connection pushing one JSON event per
    * line. Schema is explicit (no inference on a stream), `ts` arrives as
    * epoch micros and normalizes to the same TimestampType the file
    * replay produces, and corrupt lines yield null ids that are dropped —
    * the reference's per-item error-skip (`solana.rs:51-53`). Every
    * downstream transform ([[tumblingCounts]], [[streamingDedup]],
    * [[runningPosition]], [[exactlyOnceSink]]) composes unchanged,
    * because Structured Streaming separates source from plan — swapping
    * in a real gRPC source is a source-side change only.
    *
    * Scale note: a single socket is a single-receiver source (Spark's
    * socket source is test/dev grade); at production rates the same
    * schema+parse stage sits on a partitioned source (Kafka/Kinesis) and
    * the plan below it is IDENTICAL.
    */
  def subscribeSocket(spark: SparkSession, host: String, port: Int,
      eventTypes: Seq[String] = Nil): DataFrame = {
    val parsed = spark.readStream
      .format("socket").option("host", host).option("port", port).load()
      .select(from_json(col("value"), wireSchema).as("e"))
      .select(col("e.event_id"), timestamp_micros(col("e.ts")).as("ts"),
        col("e.user_id"), col("e.event_type"), col("e.value"), col("e.props"))
      .filter(col("event_id").isNotNull) // corrupt lines skip, not fail
    if (eventTypes.isEmpty) parsed
    else parsed.filter(col("event_type").isin(eventTypes.map(lit(_)): _*))
  }

  /** Wire schema both live connectors parse: epoch-micros `ts`, JSONL rows. */
  private val wireSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType), // epoch micros on the wire
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** J1/A2 (resumable live connector): subscribe to an append-only JSONL
    * event log through the [[graft.sources.SlotLogSource]] DataSource V2
    * micro-batch source — the slot-cursor subscription contract of the
    * reference's intended Yellowstone gRPC feed
    * (`adapters/src/solana_grpc.rs:8-24`, `README.md:3`): the source's
    * cursor is checkpointed with the query, so kill-and-restart resumes at
    * exactly the first unprocessed event — nothing lost, nothing
    * re-delivered (StreamingSpec proves it). Each row keeps its `slot`
    * (monotone source cursor) alongside the decoded event; corrupt lines
    * decode to null ids and are dropped per-row (`solana.rs:51-53`), never
    * failing the stream.
    */
  def subscribeSlotLog(spark: SparkSession, logPath: String,
      eventTypes: Seq[String] = Nil): DataFrame = {
    val parsed = spark.readStream
      .format("slotlog").option("path", logPath).load()
      .select(col("slot"), from_json(col("value"), wireSchema).as("e"))
      .select(col("slot"), col("e.event_id"), timestamp_micros(col("e.ts")).as("ts"),
        col("e.user_id"), col("e.event_type"), col("e.value"), col("e.props"))
      .filter(col("event_id").isNotNull) // corrupt lines skip, not fail
    if (eventTypes.isEmpty) parsed
    else parsed.filter(col("event_type").isin(eventTypes.map(lit(_)): _*))
  }

  /** J4+ (EXT): STREAM-STREAM interval join — attribute each purchase to
    * the clicks the same user made within a lookback interval before it
    * (the classic attribution/enrichment join two live streams need; a
    * stream-static join cannot express it because BOTH sides keep
    * arriving). Both sides are watermarked and the join condition bounds
    * event-time distance, so Spark provably expires join state: a
    * buffered click can only match purchases within `lookback`, and once
    * the watermark passes that horizon the row is dropped from state —
    * bounded memory at any rate, the non-negotiable property at 100 TB/
    * day. Equality on `user_id` keys the state store, so matching is
    * hash-lookup per user, never cross-stream scans.
    *
    * @return one row per (purchase, matching click): purchase identity
    *         columns + `click_ts`/`click_value`
    */
  def purchaseAttribution(purchases: DataFrame, clicks: DataFrame,
      lookback: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback") &&
        col("click_ts") <= col("purchase_ts"))
      .drop("c_user_id")
  }

  /** J2: exactly-once sink — checkpointed foreachBatch with an idempotent
    * by-key merge (the `ON CONFLICT (id) DO NOTHING` semantics,
    * repo.rs:26,56). Batch replays after failure re-merge harmlessly.
    */
  def exactlyOnceSink(
      stream: DataFrame,
      tablePath: String,
      checkpoint: String,
      keyCol: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IdempotentSink.appendOnce(batch.sparkSession, batch, tablePath, keyCol): Unit
      }
      .start()

  /** J2 (in-stream variant): drop duplicate keys INSIDE the stream with
    * watermark-bounded state — the complement of [[exactlyOnceSink]]'s
    * merge-at-the-sink: replays and at-least-once sources collapse before
    * any downstream aggregation, and the dedup state is evicted once the
    * event-time watermark passes (bounded memory at 100 TB/day rates,
    * unlike an unbounded `dropDuplicates`).
    */
  def streamingDedup(stream: DataFrame, keyCol: String, tsCol: String,
      watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** J3/J4: watermarked tumbling-window counts — late rows beyond the
    * watermark are dropped (tighter than the reference's unwrap_or(0)
    * tolerance; documented divergence, SURVEY.md §2.J3).
    */
  def tumblingCounts(stream: DataFrame, windowLen: String, watermark: String): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_val"))

  /** J4: session windows — gap-based per-user sessions. */
  def sessionCounts(stream: DataFrame, gap: String, watermark: String): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n_events"))

  /** J-EXT: watermarked stream-stream interval join — each left event joins
    * the right-stream events of the same key within the preceding
    * `lookback` (e.g. every purchase with the clicks that led to it). Both
    * sides carry watermarks and the join condition bounds event-time
    * distance, so Spark can evict join state older than
    * watermark − lookback — the ONLY way a stream-stream join stays
    * bounded-memory at production rates; an unbounded-condition join keeps
    * every row forever.
    *
    * Output columns: all of `left` + the right's ts as `r_<rightTs>` +
    * `valueCols` prefixed `r_`.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      lookback: String, watermark: String): DataFrame = {
    val r = right.select(
      (Seq(col(keyCol).as(s"r_$keyCol"), col(rightTs).as(s"r_$rightTs")) ++
        valueCols.map(c => col(c).as(s"r_$c"))): _*)
    left.withWatermark(leftTs, watermark)
      .join(r.withWatermark(s"r_$rightTs", watermark),
        col(keyCol) === col(s"r_$keyCol") &&
          col(s"r_$rightTs") >= col(leftTs) - expr(s"INTERVAL $lookback") &&
          col(s"r_$rightTs") <= col(leftTs))
      .drop(s"r_$keyCol")
  }

  /** Skew-mitigated [[intervalJoin]]: a HOT key at production rates
    * concentrates all of its join state and pair work in the one
    * partition that owns hash(key) — the streaming twin of the batch
    * skew `c6_join_salted` handles. Mitigation (same shape as batch
    * salting, adapted to bounded streaming state): the LEFT stream's
    * hot-key rows get a deterministic salt in [0, salts) hashed from the
    * row itself; the RIGHT stream REPLICATES its hot-key rows across all
    * salts (bounded: the watermark already bounds right-side state, so
    * replication multiplies a bounded window, never the stream); the
    * join key widens to (key, salt). Every original pair still meets on
    * exactly one salt, so the result is ROW-IDENTICAL to
    * [[intervalJoin]] (StreamSkewProbe asserts it) — only the state
    * placement changes, from one partition to `salts` partitions.
    * Non-hot keys keep salt 0: no replication, no extra state.
    */
  def intervalJoinSalted(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      lookback: String, watermark: String,
      hotKeys: Seq[Long], salts: Int): DataFrame = {
    require(salts >= 2, "salting below 2 is the plain join")
    val hot = hotKeys.map(lit(_))
    val l = left.withColumn("_salt",
      when(col(keyCol).isin(hot: _*),
        pmod(hash(col("*")), lit(salts))).otherwise(lit(0)))
    val rRep = right.withColumn("_r_salt",
        explode(when(col(keyCol).isin(hot: _*),
          sequence(lit(0), lit(salts - 1))).otherwise(array(lit(0)))))
    val r = rRep.select(
      (Seq(col(keyCol).as(s"r_$keyCol"), col(rightTs).as(s"r_$rightTs"),
        col("_r_salt")) ++
        valueCols.map(c => col(c).as(s"r_$c"))): _*)
    l.withWatermark(leftTs, watermark)
      .join(r.withWatermark(s"r_$rightTs", watermark),
        col(keyCol) === col(s"r_$keyCol") &&
          col("_salt") === col("_r_salt") &&
          col(s"r_$rightTs") >= col(leftTs) - expr(s"INTERVAL $lookback") &&
          col(s"r_$rightTs") <= col(leftTs))
      .drop(s"r_$keyCol", "_salt", "_r_salt")
  }

  /** J5: stateful running position per wallet — the continuously-maintained
    * balance the reference's ordered scans exist to serve (repo.rs:79,118).
    */
  final case class PositionEvent(user_id: Long, value: Double)
  final case class Position(user_id: Long, position: Double, n_events: Long)

  def runningPosition(events: Dataset[PositionEvent]): Dataset[Position] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[PositionEvent], state: GroupState[Position]) =>
          val prev = state.getOption.getOrElse(Position(uid, 0.0, 0L))
          val next = rows.foldLeft(prev) { (p, e) =>
            Position(uid, p.position + e.value, p.n_events + 1)
          }
          state.update(next)
          next
      }
  }

  /** J5 (flatMap variant): emit a row only when |position| crosses the
    * threshold — 0-or-1 outputs per group per batch, the
    * `flatMapGroupsWithState` shape for alerting/compaction streams.
    */
  def positionAlerts(events: Dataset[PositionEvent], threshold: Double): Dataset[Position] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[PositionEvent], state: GroupState[Position]) =>
          val prev = state.getOption.getOrElse(Position(uid, 0.0, 0L))
          val next = rows.foldLeft(prev) { (p, e) =>
            Position(uid, p.position + e.value, p.n_events + 1)
          }
          state.update(next)
          if (math.abs(prev.position) <= threshold && math.abs(next.position) > threshold)
            Iterator.single(next)
          else Iterator.empty
      }
  }
}

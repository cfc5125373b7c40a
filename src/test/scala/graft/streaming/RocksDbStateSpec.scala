package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Provider parity for the stateful streaming operators: the SAME plans
  * produce the SAME results under `RocksDBStateStoreProvider` — the state
  * backend a 100 TB deployment actually runs (state spills to local
  * RocksDB instead of living in executor-heap HashMaps, so state volume
  * is bounded by disk, not memory) — as under the default HDFS-backed
  * provider. The engine's operators take no position on the backend; this
  * spec is the evidence, on the two state-heaviest shapes (stream-stream
  * interval join: 4 store instances per partition; watermarked dedup).
  *
  * rocksdbjni ships in Spark's own jars — no new dependency.
  */
class RocksDbStateSpec extends SparkSpec {
  private def ts(s: Long) = new Timestamp(s * 1000)

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider[T](provider: Option[String])(f: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    provider.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
    try f finally prev.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
  }

  private def intervalJoinPairs(): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val buys = Seq((0, 10L, ts(1000)), (1, 11L, ts(2000)), (0, 10L, ts(9000)))
      .toDF("b", "user_id", "ts")
    val clicks = Seq((0, 10L, ts(900)), (1, 10L, ts(8950)), (0, 11L, ts(1990)))
      .toDF("b", "user_id", "cts")
    val inL = graft.analytics.StreamingReplay.stageBatches(buys, col("b"), 2)
    val inR = graft.analytics.StreamingReplay.stageBatches(clicks, col("b"), 2)
    def srcOf(in: String) = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val joined = EventStreams.intervalJoin(
      left = srcOf(inL).drop("b"), right = srcOf(inR).drop("b"),
      keyCol = "user_id", leftTs = "ts", rightTs = "cts",
      valueCols = Nil, lookback = "5 minutes", watermark = "60 days")
    val qn = s"rocks_join_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rocksck").toString)
      .start()
    try {
      q.processAllAvailable()
      spark.table(qn).collect().map(r =>
        (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("ts").getTime / 1000,
          r.getAs[Timestamp]("r_cts").getTime / 1000)).toSet
    } finally q.stop()
  }

  private def dedupKeys(): Set[(Long, String)] = {
    import spark.implicits._
    val events = Seq((0, 10L, "click", ts(100)), (1, 10L, "click", ts(200)),
      (0, 11L, "buy", ts(300)), (1, 11L, "buy", ts(400)), (1, 12L, "view", ts(500)))
      .toDF("b", "user_id", "event_type", "ts")
    val in = graft.analytics.StreamingReplay.stageBatches(events, col("b"), 2)
    val src = spark.readStream.schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .select(concat_ws(":", col("user_id"), col("event_type")).as("k"),
        col("user_id"), col("event_type"), col("ts"))
    val dd = EventStreams.streamingDedup(src, "k", "ts", "60 days")
    val qn = s"rocks_dedup_${System.nanoTime()}"
    val q = dd.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rocksck2").toString)
      .start()
    try {
      q.processAllAvailable()
      spark.table(qn).collect().map(r =>
        (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).toSet
    } finally q.stop()
  }

  test("stream-stream interval join: RocksDB provider ≡ default provider") {
    val default = withProvider(None)(intervalJoinPairs())
    val rocks = withProvider(Some(RocksDb))(intervalJoinPairs())
    assert(default.nonEmpty)
    assert(rocks == default, s"provider divergence:\n$rocks\nvs\n$default")
  }

  test("watermarked dedup: RocksDB provider ≡ default provider") {
    val default = withProvider(None)(dedupKeys())
    val rocks = withProvider(Some(RocksDb))(dedupKeys())
    assert(default.nonEmpty)
    assert(rocks == default, s"provider divergence:\n$rocks\nvs\n$default")
  }

  // ---- full stateful-family matrix: the DECLARED queries themselves ----
  // Each runs its real replay plan (staged batches, fresh checkpoint)
  // under both providers; results must be identical row sets. Covers the
  // remaining stateful shapes beyond the two above: exactly-once upsert
  // sink (j2), late-data watermark drop (j3), flatMapGroupsWithState
  // running position (j5), and the width-4 LEFT OUTER interval join
  // (j11) — with j8/j9 re-covered through their declared forms too.
  private val StatefulOps = Seq(
    "j2_exactly_once_replay", "j3_late_drop_replay",
    "j5_running_position_replay", "j8_stream_stream_join",
    "j9_stream_dedup", "j11_stream_outer_join")

  private def runDeclared(name: String): Set[String] =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).toSet

  StatefulOps.foreach { op =>
    test(s"$op: RocksDB provider ≡ default provider (declared query)") {
      val default = withProvider(None)(runDeclared(op))
      val rocks = withProvider(Some(RocksDb))(runDeclared(op))
      assert(default.nonEmpty, s"$op produced no rows")
      assert(rocks == default,
        s"$op diverged under RocksDB: ${rocks.size} vs ${default.size} rows; " +
          s"only-rocks=${(rocks -- default).take(3)} only-default=${(default -- rocks).take(3)}")
    }
  }
}

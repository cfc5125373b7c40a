package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.PipelineMetrics

/** Pipeline observability: metrics ride the running job (CollectMetrics),
  * never a second pass — batch via Observation, streaming via the
  * progress-event listener.
  */
class PipelineMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("batch stage metrics: counts/nulls/ts-range land without an extra job") {
    val df = Seq(
      (1L, Some("a"), 10L),
      (2L, None, 20L),
      (3L, Some("c"), 5L),
      (4L, None, 40L)).toDF("id", "tag", "ts")

    val (observed, obs) = PipelineMetrics.stage(df, "bronze_in",
      PipelineMetrics.standardMetrics(Seq("tag"), Some("ts")))

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = observed.count() // the ONLY action
      // listener events are async; poll briefly before reading the counter
      val deadline = System.currentTimeMillis() + 5000
      while (jobs.get() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      val m = obs.get
      assert(n == 4)
      assert(m("rows") == 4L)
      assert(m("nulls_tag") == 2L)
      assert(m("ts_min") == 5L && m("ts_max") == 40L)
      assert(jobs.get() <= 2, // count() itself can be 1-2 jobs; metrics add none
        s"metrics must not schedule extra jobs, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("streaming stage metrics surface per micro-batch via the listener") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val stream = PipelineMetrics.streamingStage(
      in.toDF().toDF("id", "tag"),
      "feed_health",
      PipelineMetrics.standardMetrics(Seq("tag"), None))

    val listener = new PipelineMetrics.MetricsListener(keep = 10)
    spark.streams.addListener(listener)
    val ckpt = Files.createTempDirectory("pm").toString
    val q = stream.writeStream.format("memory").queryName("pm_out")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "x"), (2L, null.asInstanceOf[String]))
      q.processAllAvailable()
      in.addData((3L, "y"))
      q.processAllAvailable()
      // progress events are delivered asynchronously after the batch
      val deadline = System.currentTimeMillis() + 10000
      while (listener.history("feed_health").size < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)

      val h = listener.history("feed_health")
      assert(h.size >= 2, s"expected 2 micro-batch metric rows, got ${h.size}")
      assert(h.head.getAs[Long]("rows") == 2L)
      assert(h.head.getAs[Long]("nulls_tag") == 1L)
      assert(h(1).getAs[Long]("rows") == 1L)
      assert(listener.latest("feed_health").get.getAs[Long]("rows") == 1L)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("deduping corpus ingest reports feed health per micro-batch when observed") {
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("pmi").toString
    val in = MemoryStream[(String, String)]
    val listener = new PipelineMetrics.MetricsListener()
    spark.streams.addListener(listener)
    val q = graft.streaming.CorpusIngest.dedupingSink(
      in.toDF().toDF("doc_id", "text"),
      s"$tmp/corpus", s"$tmp/index", s"$tmp/ckpt",
      textCol = "text", idCol = "doc_id",
      observeAs = Some("corpus_feed"))
    try {
      in.addData(("a", "the quick brown fox jumps over the lazy dog again"),
        ("b", null.asInstanceOf[String]))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 10000
      while (listener.latest("corpus_feed").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val m = listener.latest("corpus_feed").get
      assert(m.getAs[Long]("rows") == 2L)
      assert(m.getAs[Long]("nulls_text") == 1L,
        "a dead upstream field shows up as a null spike in the same batch")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("collect() gathers several stages from one action") {
    val docs = Seq(("d1", 3L), ("d2", 0L), ("d3", 7L)).toDF("doc", "toks")
    val (s1, o1) = PipelineMetrics.stage(docs, "in", Seq(count(lit(1)).as("rows")))
    val filtered = s1.filter(col("toks") > 0)
    val (s2, o2) = PipelineMetrics.stage(filtered, "kept",
      Seq(count(lit(1)).as("rows"), sum(col("toks")).as("toks")))
    val out = PipelineMetrics.collect({ s2.count(); () }, "in" -> o1, "kept" -> o2)
    assert(out("in")("rows") == 3L)
    assert(out("kept")("rows") == 2L)
    assert(out("kept")("toks") == 10L)
  }
}

package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.EventStreams

/** Dev probe: does a HOT key materialize a straggler in the stream-stream
  * interval join (j8/j11's operator), and does the salted variant
  * ([[EventStreams.intervalJoinSalted]]) fix it?
  *
  * Corpus: synthetic purchases/clicks at 2 events/sec where 90% of rows
  * carry ONE user_id. The quadratic term this exposes: Spark's
  * symmetric-hash join state is keyed by the JOIN KEY ONLY — every
  * arriving left row retrieves the key's ENTIRE right-state row list and
  * post-filters the interval condition, so a hot key costs
  * O(hotLeft × hotRight) comparisons, ALL on the one partition that owns
  * hash(key) (a 10-second lookback bounds the OUTPUT, not the probe
  * work). Salting splits the left rows across `salts` sub-keys and
  * replicates the hot right rows to each, dividing the per-partition
  * probe work (and the wall-clock straggler) by `salts` at the price of
  * `salts`× state for the hot key's bounded window.
  *
  * Both variants run the same 2-batch replay at shuffle width 8; the
  * probe asserts pair-set equality (count + order-free checksum) and
  * prints wall seconds per variant. Evidence lands in BASELINE.md.
  *
  * Usage: runMain graft.tools.StreamSkewProbe [rows] [salts]
  */
object StreamSkewProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(40000L)
    val salts = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = GraftSession.getOrCreate("graft-streamskew",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    val Hot = 777L
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      timestamp_seconds(lit(1700000000L) + col("id") / 2).as("ts"),
      when(pmod(col("id"), lit(10)) < 9, lit(Hot))
        .otherwise(pmod(col("id"), lit(9999)) + 10000).as("user_id"),
      when(pmod(col("id"), lit(2)) === 0, lit("click"))
        .otherwise(lit("purchase")).as("event_type"),
      (col("id") % 100 / lit(10.0)).as("value"))
      .localCheckpoint(true)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val inL = graft.analytics.StreamingReplay.stageBatches(
      buys, pmod(col("buy_id"), lit(4)).cast("int"), 2)
    val inR = graft.analytics.StreamingReplay.stageBatches(
      clicks, pmod(col("click_id"), lit(4)).cast("int"), 2)

    def srcOf(in: String): DataFrame = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1).parquet(in)

    /** Run one replay to a memory sink; return (seconds, pairs, checksum). */
    def run(tag: String, salted: Boolean): (Double, Long, Long) = {
      val joined =
        if (salted) EventStreams.intervalJoinSalted(
          left = srcOf(inL), right = srcOf(inR), keyCol = "user_id",
          leftTs = "ts", rightTs = "ts", valueCols = Seq("click_id"),
          lookback = "10 seconds", watermark = "60 days",
          hotKeys = Seq(Hot), salts = salts)
        else EventStreams.intervalJoin(
          left = srcOf(inL), right = srcOf(inR), keyCol = "user_id",
          leftTs = "ts", rightTs = "ts", valueCols = Seq("click_id"),
          lookback = "10 seconds", watermark = "60 days")
      val qn = s"skew_${tag}_${System.nanoTime()}"
      val t0 = System.nanoTime()
      val q = joined.writeStream.format("memory").queryName(qn)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("skewck").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val agg = spark.table(qn)
        .agg(count(lit(1)), sum(hash(col("buy_id"), col("r_click_id")).cast("long")))
        .head()
      spark.catalog.dropTempView(qn)
      println(f"[skew] $tag%-14s $sec%7.2f s  pairs=${agg.getLong(0)}  sum=${agg.getLong(1)}")
      (sec, agg.getLong(0), agg.getLong(1))
    }

    run("warmup", salted = false)
    val plain = Seq(run("plain_1", salted = false), run("plain_2", salted = false))
    val saltd = Seq(run("salted_1", salted = true), run("salted_2", salted = true))
    require(plain.map(_._2).toSet.size == 1 && saltd.head._2 == plain.head._2,
      s"pair count diverged: plain=${plain.map(_._2)} salted=${saltd.map(_._2)}")
    require(saltd.head._3 == plain.head._3,
      "pair checksum diverged between plain and salted")
    val p = plain.map(_._1).min
    val s = saltd.map(_._1).min
    println(f"[skew] plain(min)=$p%.2f s salted(min)=$s%.2f s speedup=${p / s}%.2fx " +
      f"(rows=$n, 90%% on one key, salts=$salts, shuffle=8)")
    spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.stop()
  }
}

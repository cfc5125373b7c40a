package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Dev probe: j11 (stream-stream LEFT OUTER replay) wall time as a
  * function of the pinned shuffle width — the width drives state-store
  * instance count per batch (4 stores × width), but too-narrow widths
  * serialize the batch-side scans. Matched runs in one JVM.
  *
  * Usage: runMain graft.tools.OuterJoinWidthProbe [sfDir]
  */
object OuterJoinWidthProbe {
  def main(args: Array[String]): Unit = {
    OracleAux.enabled = false
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("ojw-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def run(width: Int): Double = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, width.toString)
      try {
        val ev = Tables.events(spark, d)
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("user_id").as("c_user_id"), col("ts").as("cts"))
        val inL = graft.analytics.StreamingReplay.stageBatchesMemo("p11_buys", d, buys,
          pmod(col("buy_id"), lit(2)).cast("int"), 2)
        val inR = graft.analytics.StreamingReplay.stageBatchesMemo("p11_clicks", d, clicks,
          pmod(col("click_id"), lit(2)).cast("int"), 2)
        def srcOf(in: String) = spark.readStream
          .schema(spark.read.parquet(in).schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val joined = srcOf(inL).withWatermark("ts", "1 hour")
          .join(srcOf(inR).withWatermark("cts", "1 hour"),
            col("user_id") === col("c_user_id") &&
              col("cts") >= col("ts") - expr("INTERVAL 30 minutes") &&
              col("cts") <= col("ts"),
            "left_outer")
        val t0 = System.nanoTime()
        val qn = s"p11_w${width}_${System.nanoTime()}"
        val q = joined.writeStream.format("memory").queryName(qn)
          .outputMode("append")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("p11ck").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
        val n = spark.table(qn).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] width=$width%-3d $s%6.2f s ($n rows)")
        s
      } finally spark.conf.set(key, prev)
    }
    (1 to 3).foreach { _ => Seq(8, 4, 2, 16).foreach(run) }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.normalize.SolanaNormalizer

/** Dev tool: scaling evidence for the normalizer — times the full
  * JSON-build → parse → delta → dust pipeline at 1× and 10× input (events
  * replicated with remapped ids, so keys stay unique) and prints the
  * ratio. Linear ≈ 10; superlinear means a shuffle or driver bottleneck.
  * Usage: runMain graft.tools.ScaleCheck [sfDir]
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.getOrCreate("graft-scalecheck", cpus.toInt)

    def replicate(df: DataFrame, times: Int): DataFrame =
      (0 until times).map { i =>
        df.withColumn("event_id", col("event_id") * times + i)
          .withColumn("user_id", col("user_id") * times + i)
      }.reduce(_ unionAll _)

    def time(what: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$what%-20s $s%7.2f s")
      s
    }

    def normalized(ev: DataFrame) = {
      val wallet = concat(lit("W"), col("user_id"))
      val lamports = floor(col("value") * 1e9).cast("long")
      val bronze = ev.select(
        concat(lit("tx"), col("event_id")).as("id"),
        concat(lit("u"), col("user_id")).as("user_id"),
        wallet.as("wallet_address"),
        unix_timestamp(col("ts")).as("timestamp"),
        concat(lit("h"), col("event_id")).as("tx_hash"),
        lit("solana").as("chain"),
        concat(
          lit("""{"slot": """), col("event_id"),
          lit(""", "blockTime": """), unix_timestamp(col("ts")),
          lit(""", "transaction": {"signatures": ["s"], "message": {"accountKeys": [{"pubkey": """"),
          wallet,
          lit("""", "signer": true, "writable": true}], "recentBlockhash": "x"}}, "meta": {"fee": 0, "preBalances": [10000000000], "postBalances": ["""),
          (lit(10000000000L) - lamports),
          lit("""], "preTokenBalances": [], "postTokenBalances": []}}""")
        ).as("raw_metadata"))
      SolanaNormalizer.normalize(bronze)
    }

    val events1 = Tables.events(spark, sfDir).localCheckpoint(true)
    val events10 = replicate(events1, 10).localCheckpoint(true)
    println(s"events 1x=${events1.count()} 10x=${events10.count()}")
    time("normalize warmup")(normalized(events1))
    val n1 = time("normalize 1x")(normalized(events1))
    val n10 = time("normalize 10x")(normalized(events10))
    println(f"normalize ratio: ${n10 / n1}%.1f (linear = 10)")
    spark.stop()
  }
}

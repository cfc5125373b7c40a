package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.analytics.LedgerQueries
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

    def normalized(ev: DataFrame) =
      SolanaNormalizer.normalize(LedgerQueries.bronzeFromEvents(ev))

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

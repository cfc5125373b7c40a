package graft.tools

import graft.{GraftSession, SparkEntry}

/** One-JVM timing probe for the streaming-replay family (round-12 bench
  * headroom work): times each J query steady-state under the CURRENT
  * implementation, so a conf/batch-count change can be attributed to a
  * stage rather than to JVM warmup or shared-host noise.
  *
  * Usage: runMain graft.tools.ReplayProbe [sfDir] [reps]
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    OracleAux.enabled = false
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.getOrCreate("replay-probe", 32)
    val js = SparkEntry.queries.keys.filter(_.startsWith("j")).toSeq.sorted
    js.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}  min=${ts.min}%.2f")
    }
    spark.stop()
  }
}

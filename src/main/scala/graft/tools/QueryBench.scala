package graft.tools

import graft.{GraftSession, SparkEntry}

/** Micro-bench one declared query N times in one JVM — separates real plan
  * cost (steady-state runs) from codegen warmup (run 1) and shared-host
  * noise (compare spread across invocations; see BASELINE.md variance
  * warning).
  *
  * Usage: runMain graft.tools.QueryBench <queryName> [sfDir] [reps]
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    OracleAux.enabled = false // timing-only: never clobber oracle artifacts
    val name = args.headOption.getOrElse("i1_normalize_events")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = GraftSession.getOrCreate("query-bench", 32)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

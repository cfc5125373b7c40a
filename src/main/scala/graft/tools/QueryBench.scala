package graft.tools

import graft.{GraftSession, SparkEntry}

/** Micro-bench declared queries N times in one JVM — separates real plan
  * cost (steady-state runs) from codegen warmup (run 1) and shared-host
  * noise (compare spread across invocations; see BASELINE.md variance
  * warning).
  *
  * Usage: runMain graft.tools.QueryBench <name>[,<name>...] [sfDir] [reps] [planDir]
  *
  * Several comma-separated names run sequentially in ONE session (the
  * round-16 attribution workflow: a JVM per query pays 25 s of sbt/session
  * startup each). When `planDir` is given, each query's
  * `.explain("formatted")` is also written to `<planDir>/<name>.txt` —
  * the plans/r16 before/after evidence files.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    OracleAux.enabled = false // timing-only: never clobber oracle artifacts
    val names = args.headOption.getOrElse("i1_normalize_events").split(',').toSeq
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 4
    val planDir = if (args.length > 3) Some(args(3)) else None
    val spark = GraftSession.getOrCreate("query-bench", 32)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val ts = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"$name run $i: $t%.2f s")
        t
      }
      val steady = ts.drop(1)
      val med = steady.sorted.apply(steady.length / 2)
      println(f"$name steady-median: $med%.3f s (min ${ts.min}%.3f)")
      // r17 (r16 ADVICE): dump the plan AFTER the timed reps — a pre-rep
      // dump invoked fn() once untimed, warming construction side effects
      // (adhocEdges persist, eager localCheckpoints), so "run 1 = codegen
      // warmup" meant something different with planDir set.
      planDir.foreach { dir =>
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.writeString(p.resolve(s"$name.txt"),
          fn(spark, d).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}

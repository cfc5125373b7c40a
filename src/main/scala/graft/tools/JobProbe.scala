package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.{GraftSession, SparkEntry}

/** Count Spark JOBS per rep of a declared query — the attribution tool for
  * operators whose cost is per-job scheduling overhead rather than data
  * (maintained-sketch batches, iterative convergence loops). A query that
  * runs k sequential actions pays k× job launch latency no matter how tiny
  * the data; the fix (riding advisory aggregates on the commit action,
  * fusing sketch+union+commit into one plan) shows up here as a falling
  * jobs-per-rep count before it shows up in wall-clock.
  *
  * Usage: runMain graft.tools.JobProbe <name>[,<name>...] [sfDir] [reps]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    OracleAux.enabled = false // timing-only: never clobber oracle artifacts
    val names = args.headOption.getOrElse("d9_hll_incremental").split(',').toSeq
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = GraftSession.getOrCreate("job-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def settled(): Long = {
      // the listener bus is asynchronous to the action returning — wait for
      // the counter to stop moving before reading it
      var prev = -1L
      var cur = jobs.get()
      while (cur != prev) { Thread.sleep(150); prev = cur; cur = jobs.get() }
      cur
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      (1 to reps).foreach { i =>
        val j0 = settled()
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        val j = settled() - j0
        println(f"[job-probe] $name rep $i: $t%.3f s, $j jobs")
      }
    }
    spark.stop()
  }
}

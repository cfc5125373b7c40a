package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every declared query at the given scale factor and
  * emits ONE JSON line (stdout + bench_out.json for robust machine parsing).
  * Failures are recorded per-query under "errors", never as fake timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.getOrCreate("graft-bench", cpus.toInt)

    // untimed warmup: the first timed query otherwise absorbs session
    // startup (codegen, hadoop init, noop-sink lookup) into its number
    try SparkEntry.queries("d2_count")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      // best-effort, but never silent: a skipped warmup re-skews the first
      // timed query's number
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // "queries" first, summary fields LAST: the harness that collects this
    // output keeps only the tail of the run log, so a summary-first layout
    // gets its total truncated away once the per-query map grows long.
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and a
    // comma-decimal locale would render 0,123 — invalid JSON.
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = timings.map { case (k, v) => s"${jstr(k)}:${num(v)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val line =
      s"""{"queries":$qs,"errors":$es,"sf":${jstr(sfDir)},"n_ok":${timings.size},"n_err":${errors.size},"metric":"total","unit":"sec","value":${num(total)}}"""
    println(line)
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    spark.stop()
  }
}

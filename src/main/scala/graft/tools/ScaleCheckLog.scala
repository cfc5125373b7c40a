package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.sources.SnapshotTable

/** Dev tool: lakehouse METADATA-scale evidence (round-16 verdict item 6).
  *
  * The SnapshotTable driver rows claim bounded tail replay: resolution
  * reads ONE checkpoint plus at most [[SnapshotTable.checkpointInterval]]
  * trailing log entries, the change feed plans one log-entry read per
  * REQUESTED version, and vacuum's cost tracks reclaimable files — none
  * of them should scale with total log depth. This main measures those
  * claims once at depth: a table taken to 1,000+ commits (→ 100+
  * checkpoints at interval 10), with resolution timed at depth 100 / 500
  * / 1,000, a fixed 10-version change-feed read timed at shallow vs full
  * depth, history() (documented ∝ commits), and a deep vacuum.
  *
  * Emits one human table + one JSON line for BASELINE.md.
  *
  * Usage: runMain graft.tools.ScaleCheckLog [nCommits]
  */
object ScaleCheckLog {
  def main(args: Array[String]): Unit = {
    val nCommits = args.headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.getOrCreate("graft-scalechecklog", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val table = graft.Tables.scratchDir("graft_logscale")

    def timeMs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e6)
    }
    // median of 5 — resolution is a ~ms-scale metadata read; a single
    // sample is all JIT/FS-cache noise
    def med5(f: => Unit): Double = {
      val xs = (1 to 5).map { _ => timeMs(f)._2 }.sorted
      xs(2)
    }

    def appendOne(v: Int): Unit = {
      val df = Seq((v.toLong, s"payload_$v")).toDF("k", "s").coalesce(1)
      // every 100th commit OVERWRITES (retiring the standing files): an
      // append-only log never unrefences anything, so vacuum would have
      // zero reclaimable work and the measurement would prove nothing
      if (v % 100 == 0) SnapshotTable.commitOverwrite(spark, table, df)
      else SnapshotTable.commitAppend(spark, table, df, statsCols = Seq("k"))
    }

    val marks = Seq(100, 500, nCommits)
    val resolveAt = scala.collection.mutable.LinkedHashMap.empty[Int, Double]
    val feedAt = scala.collection.mutable.LinkedHashMap.empty[Int, Double]
    var appendTotalSec = 0.0

    (1 to nCommits).foreach { v =>
      val (_, ms) = timeMs(appendOne(v))
      appendTotalSec += ms / 1000.0
      if (marks.contains(v)) {
        val cur = SnapshotTable.currentVersion(spark, table)
        resolveAt(v) = med5 { SnapshotTable.snapshot(spark, table); () }
        // fixed-width feed read: the last 10 versions — cost must track
        // the RANGE (10 entries + their rows), never the log depth
        feedAt(v) = med5 {
          SnapshotTable.changes(spark, table, cur - 10, cur).count(); ()
        }
        println(f"[logscale] depth=$v%5d resolve=${resolveAt(v)}%8.1f ms " +
          f"feed10=${feedAt(v)}%8.1f ms (appends so far: $appendTotalSec%.0f s)")
      }
    }

    val (histN, histMs) = timeMs(SnapshotTable.history(spark, table).count())
    // deep-history vacuum: retain 50 versions; reclaimable = the other
    // ~950 single-row files. minAge 0: this JVM is the only writer.
    val (vacN, vacMs) = timeMs(
      SnapshotTable.vacuum(spark, table, retainVersions = 50, minAgeMillis = 0L))
    val (postVacResolve) = med5 { SnapshotTable.snapshot(spark, table); () }

    val flatRatio = resolveAt(nCommits) / resolveAt(100)
    val feedRatio = feedAt(nCommits) / feedAt(100)
    println(f"[logscale] resolution depth-ratio ${flatRatio}%.2f (flat = ~1; " +
      "resolution reads one checkpoint + <=10-entry tail at ANY depth)")
    println(f"[logscale] feed(10-version) depth-ratio ${feedRatio}%.2f (flat = ~1)")
    println(f"[logscale] history: $histN rows in ${histMs}%.0f ms (∝ commits by contract)")
    println(f"[logscale] vacuum: removed $vacN files in ${vacMs}%.0f ms; " +
      f"post-vacuum resolve ${postVacResolve}%.1f ms")

    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", v)
    println(s"""{"tool":"ScaleCheckLog","commits":$nCommits,""" +
      s""""resolve_ms":{${resolveAt.map { case (k, v) => s""""$k":${num(v)}""" }.mkString(",")}},""" +
      s""""feed10_ms":{${feedAt.map { case (k, v) => s""""$k":${num(v)}""" }.mkString(",")}},""" +
      s""""resolve_depth_ratio":${num(flatRatio)},"feed_depth_ratio":${num(feedRatio)},""" +
      s""""history_ms":${num(histMs)},"history_rows":$histN,""" +
      s""""vacuum_removed":$vacN,"vacuum_ms":${num(vacMs)},""" +
      s""""post_vacuum_resolve_ms":${num(postVacResolve)}}""")
    spark.stop()
  }
}

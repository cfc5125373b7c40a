package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.analytics.GraphQueries

/** Matched-pair A/B for the r16 g4_pagerank shuffle_hash hints (VERDICT
  * r16 item 2: the hinted variant never measured a clean window). A = the
  * shipped shape (shuffle_hash on the rank/sum sides of both per-iteration
  * joins), B = the r15 shape (no hints — planner default sort-merge). Both
  * run over the SAME adhocEdges cache, reps alternate A/B/A/B in ONE JVM,
  * so shared-host noise hits both arms equally.
  *
  * Usage: runMain graft.tools.PagerankAbProbe [sfDir] [reps-per-arm]
  */
object PagerankAbProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.getOrCreate("pr-ab-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val (e, deg, n) = GraphQueries.adhocEdges(spark, d)
    val teleport = (15L * (GraphQueries.Total / n)) / 100

    // the g4_pagerank loop body, verbatim, hint application toggled
    def rank(hints: Boolean): DataFrame = {
      var r = deg.select(col("node"), col("deg"),
        lit(GraphQueries.Total / n).as("rank"))
      val eRen = e.select(col("src").as("_src"), col("dst").as("_dst"))
      for (_ <- 1 to 3) {
        val pre = r.select(col("node").as("_src"),
          expr("rank DIV deg").as("contrib"))
        val sums = (if (hints) pre.hint("shuffle_hash") else pre)
          .join(eRen, "_src")
          .groupBy(col("_dst").as("node"))
          .agg(sum("contrib").as("s"))
        r = deg.join(if (hints) sums.hint("shuffle_hash") else sums,
            Seq("node"), "left")
          .na.fill(0L, Seq("s"))
          .select(col("node"), col("deg"),
            expr(s"$teleport + (85 * s) DIV 100").as("rank"))
      }
      r.select(col("node"), substring(col("node"), 1, 1).as("side"),
          col("deg").as("degree"), col("rank").as("rank_ppt"))
        .orderBy("node")
    }

    def run(tag: String, hints: Boolean): Double = {
      val t0 = System.nanoTime()
      rank(hints).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[pr-ab] $tag: $t%.3f s")
      t
    }
    // one untimed warmup per arm (codegen)
    run("warmup A(shj)", hints = true)
    run("warmup B(smj)", hints = false)
    val as = scala.collection.mutable.ArrayBuffer[Double]()
    val bs = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { i =>
      as += run(s"rep$i A(shj)", hints = true)
      bs += run(s"rep$i B(smj)", hints = false)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[pr-ab] A(shj hints) median ${med(as.toSeq)}%.3f min ${as.min}%.3f | " +
      f"B(no hints)  median ${med(bs.toSeq)}%.3f min ${bs.min}%.3f")
    spark.stop()
  }
}

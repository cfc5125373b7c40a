package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Round/phase attribution for g4_connected_components: times the sampled
  * edge derivation and the alternating-star loop separately and prints the
  * round count ([[graft.operators.GraphOps.connectedComponents]] returns
  * it) — the JobProbe 55-jobs/rep reading needs a rounds × stages split
  * before any fix lands.
  *
  * Usage: runMain graft.tools.CcProbe [sfDir] [reps]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.getOrCreate("cc-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val pairs = Tables.orders(spark, d)
        .where(pmod(col("o_orderkey"), lit(97)) === 0)
        .select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("C"), col("o_custkey")).as("src"),
          concat(lit("S"), col("l_suppkey")).as("dst"))
        .distinct()
        .localCheckpoint(true)
      val nEdges = pairs.count()
      val t1 = System.nanoTime()
      val widthKey = "spark.sql.shuffle.partitions"
      val prevWidth = spark.conf.get(widthKey)
      val (labels, rounds) = try {
        spark.conf.set(widthKey, "8")
        graft.operators.GraphOps.connectedComponents(pairs)
      } finally spark.conf.set(widthKey, prevWidth)
      labels.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[cc-probe] rep$i edges: ${(t1 - t0) / 1e9}%.3f s " +
        f"($nEdges edges), loop+noop: ${(t2 - t1) / 1e9}%.3f s, $rounds rounds")
    }
    spark.stop()
  }
}

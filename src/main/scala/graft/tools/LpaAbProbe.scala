package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Matched-pair A/B for the r16 labelPropagate rewrite: the r15 shape
  * (scatter join keyed on dst — re-Exchanges the src-partitioned edge
  * cache every round — plus a row_number window argmax) vs the r16 shape
  * (symmetric-gather join keyed on src — exchange-free against the cached
  * layout — plus a two-level min_by aggregate). Both run over the SAME
  * cached edge relation, reps alternate A/B/A/B in ONE JVM, so shared-host
  * noise hits both arms equally (the BASELINE.md variance discipline).
  *
  * Usage: runMain graft.tools.LpaAbProbe [sfDir] [reps]
  */
object LpaAbProbe {
  private def edges(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("C"), col("o_custkey")).as("c"),
        concat(lit("S"), col("l_suppkey")).as("p"))
      .distinct()
    pairs.select(col("c").as("src"), col("p").as("dst"))
      .unionAll(pairs.select(col("p").as("src"), col("c").as("dst")))
  }

  /** The r15 implementation, verbatim. */
  private def lpaWindow(edges: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    (1 to rounds).foreach { _ =>
      val w = Window.partitionBy("src").orderBy(col("c").desc, col("lbl"))
      labels = edges.join(labels.withColumnRenamed("node", "nbr"),
          col("dst") === col("nbr"))
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("src").as("node"), col("lbl"))
    }
    labels
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.getOrCreate("lpa-ab", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val e = edges(spark, d).repartition(col("src")).persist()
    e.count() // materialize the cache outside both arms' clocks

    def shape(df: DataFrame): DataFrame =
      df.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("size"), min(col("node")).as("first_member"))
        .orderBy("community")

    def time(tag: String, f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[lpa-ab] $tag: $t%.3f s"); t
    }
    val (as, bs) = (collection.mutable.Buffer[Double](),
      collection.mutable.Buffer[Double]())
    (1 to reps).foreach { i =>
      as += time(s"window  rep$i", () => shape(lpaWindow(e, 3)))
      bs += time(s"min_by  rep$i", () =>
        shape(graft.operators.GraphOps.labelPropagate(e, 3)))
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[lpa-ab] window median ${med(as.toSeq)}%.3f s  min ${as.min}%.3f")
    println(f"[lpa-ab] min_by median ${med(bs.toSeq)}%.3f s  min ${bs.min}%.3f")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Observed}

/** Phase-level attribution INSIDE [[Dedup.clustersCounted]] — ClusterProbe
  * showed the sf0.1 loop converges in 2 rounds (diameter-1 near-dup
  * clusters), so the ~2 s "clusters" term is NOT round count; this probe
  * replicates the operator body and times (a) the edge restriction +
  * edgeNodes build, (b) each propagation round's job, (c) the final
  * singleton rejoin materialization, to find where the seconds actually
  * sit.
  *
  * Usage: runMain graft.tools.ClusterLoopProbe [sfDir] [reps]
  */
object ClusterLoopProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.getOrCreate("cluster-loop-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cluster-loop] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to reps).foreach { i =>
      val sh = Tables.fanOut(docs)
        .select(col("doc_id").as("_id"),
          graft.functions.VectorFunctions.shingles(
            split(col("text"), " "), 3).as("_sh"))
        .filter(size(col("_sh")) > 0)
        .localCheckpoint(true)
      val pairs = Dedup.minHashLshFromShingles(sh, threshold = 0.5)
        .localCheckpoint(true)
      val ids = docs.select(col("doc_id"))

      // ---- clustersCounted body, instrumented ----
      val idSet = ids.select(col("doc_id").as("id"))
      val edges = time(s"rep$i edges build")(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
          .join(idSet.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .join(idSet.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          .localCheckpoint(true))
      val edgeNodes = time(s"rep$i edgeNodes")(
        edges.select(col("src").as("id")).distinct().localCheckpoint(true))
      var labels = edgeNodes.select(col("id"), col("id").as("cluster"))
      var changed = true
      var r = 0
      while (changed) {
        val neighbourMin = edges
          .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(min(col("cluster")).as("nbr_cluster"))
        val obs = org.apache.spark.sql.Observation()
        val step = time(s"rep$i round$r job")(labels
          .join(neighbourMin, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("nbr_cluster"), col("cluster")))
              .as("cluster"),
            (col("nbr_cluster") < col("cluster")).as("_moved"))
          .observe(obs, coalesce(sum(when(col("_moved"), 1L).otherwise(0L)),
            lit(0L)).as("_n_moved"))
          .localCheckpoint(true))
        changed = time(s"rep$i round$r metric")(
          Observed.long(obs, "_n_moved")
            .map(_ > 0L)
            .getOrElse(step.filter(col("_moved")).limit(1).count() > 0))
        labels = step.drop("_moved")
        r += 1
      }
      val singletons = ids.select(col("doc_id").as("id"))
        .join(edgeNodes, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("cluster"))
      time(s"rep$i final union noop")(
        labels.unionByName(singletons)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

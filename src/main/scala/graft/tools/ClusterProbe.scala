package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Stage attribution for the k2 cascade family (k2_dedup_cascade /
  * k2_dedup_keep_best / k2_cluster_transitive all ride the same spine):
  * times, separately, (1) the shingle+signature build, (2) the LSH
  * banding + exact-Jaccard verify that yields near-dup pairs, (3) the
  * min-label clusters() loop, (4) the survivor anti/semi join — so a
  * round's optimization effort lands on the measured term instead of the
  * assumed one.
  *
  * Usage: runMain graft.tools.ClusterProbe [sfDir] [reps]
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.getOrCreate("cluster-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cluster-probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to reps).foreach { i =>
      val sh = time(s"rep$i shingle build")(
        Tables.fanOut(docs)
          .select(col("doc_id").as("_id"),
            graft.functions.VectorFunctions.shingles(
              split(col("text"), " "), 3).as("_sh"))
          .filter(size(col("_sh")) > 0)
          .localCheckpoint(true))
      val pairs = time(s"rep$i lsh pairs")(
        Dedup.minHashLshFromShingles(sh, threshold = 0.5)
          .localCheckpoint(true))
      println(s"[cluster-probe] rep$i pairs rows: ${pairs.count()}")
      val labels = time(s"rep$i clusters") {
        val (l, rounds) =
          Dedup.clustersCounted(docs.select(col("doc_id")), "doc_id", pairs)
        println(s"[cluster-probe] rep$i clusters rounds: $rounds")
        l.localCheckpoint(true)
      }
      time(s"rep$i survivors") {
        docs.join(labels.filter(col("id") === col("cluster"))
            .select(col("id").as("doc_id")), Seq("doc_id"), "left_semi")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

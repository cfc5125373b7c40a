package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry, Tables}

/** Dev tool: the heavy-class sf1 stress sweep — runs the most expensive
  * DECLARED queries (streaming replays, graph family, dedup/ANN heavies)
  * unchanged on sf0.1 and on a 10× synthetic blow-up of the same tables
  * (≈ sf1, which the driver does not ship), and reports per-query
  * ratios. Linear ≈ 10; anything ≫ 10 is a plan that will not survive a
  * scale-up and gets named loudly.
  *
  * The blow-up preserves each table's STRUCTURE, not just its size:
  *  - events: ids remapped per replica (unique keys, constant per-key
  *    density) — the regime a growing feed exhibits;
  *  - documents: remapped ids + a distinct trailing token (near-dups,
  *    not exact dups — the candidate-verify path stays honest);
  *  - embeddings: remapped vec ids, vectors unchanged (cell occupancy
  *    grows, centroid geometry constant);
  *  - orders/lineitem: ALL keys remapped per replica, so the trading
  *    graph gets 10× nodes and 10× edges at constant degree
  *    distribution (10 disjoint copies — rank iterations and triangle
  *    wedge work scale linearly iff the plans are linear).
  *
  * Usage: runMain graft.tools.StressSweep [sfDir] [outDir]
  */
object StressSweep {

  private val Heavy = Seq(
    "j2_exactly_once_replay", "j3_late_drop_replay", "j5_running_position_replay",
    "g4_pagerank", "g4_pagerank_bucketed", "g4_pagerank_durable", "g4_triangles",
    "k2_semantic_dedup", "k2_dedup_cascade", "k2_cluster_transitive",
    "k3_ann_ivf", "k6_decontaminate", "c5_ledger_fiat_enrich",
    // round-10 session-2 heavies: the exact PPJoin pair (output grows with
    // planted replica clusters, candidates must stay prefix-bounded) and
    // the two incremental-maintenance queries (constant sketch state —
    // cost must be the delta scans alone)
    "k2_prefix_join", "k2_prefix_join_against",
    "k4_countmin_incremental", "d9_hll_incremental")

  /** The second-decade set: the five highest sf1 ratios from BASELINE.md's
    * sweep table — the queries whose 10× headroom most needs 100×
    * evidence that the ratios do not compound (round-10 verdict #7).
    */
  private val Decade = Seq(
    "k2_cluster_transitive", "k2_dedup_cascade",
    "k2_prefix_join", "k2_prefix_join_against", "c5_ledger_fiat_enrich")

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.filter(_ == "decade")
    val rest = if (mode.isDefined) args.drop(1) else args
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = rest.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-sf1").toString)
    val spark = GraftSession.getOrCreate("graft-stress",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    blowUp(spark, sfDir, outDir, times = 10)

    def timeQuery(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Group by dir: the graph layout memo rewrites its catalog tables on
    // each dir switch, so interleaving dirs would re-pay the layout write
    // per query. Two timed reps per dir; min taken (rep 1 carries
    // codegen + layout warmup).
    def sweep(names: Seq[String], loDir: String, hiDir: String,
        loLabel: String, hiLabel: String): Unit = {
      val base = names.map { n =>
        n -> math.min(timeQuery(n, loDir), timeQuery(n, loDir))
      }.toMap
      val blown = names.map { n =>
        n -> math.min(timeQuery(n, hiDir), timeQuery(n, hiDir))
      }.toMap
      println(f"${"query"}%-28s $loLabel%8s $hiLabel%8s  ratio (linear = 10)")
      names.foreach { n =>
        val r = blown(n) / base(n)
        val flag = if (r > 15.0) "  <-- SUPERLINEAR, audit the plan" else ""
        println(f"$n%-28s ${base(n)}%7.2fs ${blown(n)}%7.2fs  ${r}%5.1f$flag")
      }
    }

    mode match {
      case Some(_) =>
        // SECOND decade: 10× dir → 100× dir (≈ sf10), worst-ratio set
        // only. Per-decade ratios that hold ≈ the first decade's are the
        // evidence the plans don't compound.
        val out100 = s"$outDir-x100"
        blowUp(spark, outDir, out100, times = 10)
        sweep(Decade, outDir, out100, "10x", "100x")
      case None =>
        sweep(Heavy, sfDir, outDir, "sf0.1", "10x")
    }
    spark.stop()
  }

  /** Materialize the 10× dir (idempotent: skips tables already written). */
  private def blowUp(spark: SparkSession, sfDir: String, outDir: String,
      times: Int): Unit = {
    def writeIfAbsent(name: String)(df: => DataFrame): Unit = {
      val p = s"$outDir/$name.parquet"
      if (!new java.io.File(p).exists()) {
        df.write.mode("overwrite").parquet(p)
        println(s"[sweep] wrote $p")
      }
    }
    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until times).map(i => f(df, i)).reduce(_ unionAll _)

    writeIfAbsent("events")(rep(Tables.events(spark, sfDir)) { (d, i) =>
      d.withColumn("event_id", col("event_id") * times + i)
        .withColumn("user_id", col("user_id") * times + i)
    })
    writeIfAbsent("documents")(rep(spark.read.parquet(s"$sfDir/documents.parquet")) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") * times + i)
        .withColumn("text", concat(col("text"), lit(s" replica$i")))
    })
    writeIfAbsent("embeddings")(rep(spark.read.parquet(s"$sfDir/embeddings.parquet")) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") * times + i)
    })
    writeIfAbsent("orders")(rep(spark.read.parquet(s"$sfDir/orders.parquet")) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") * times + i)
        .withColumn("o_custkey", col("o_custkey") * times + i)
    })
    writeIfAbsent("lineitem")(rep(spark.read.parquet(s"$sfDir/lineitem.parquet")) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") * times + i)
        .withColumn("l_suppkey", col("l_suppkey") * times + i)
    })
    // small dims the heavy queries may touch: copy 1× (dimension tables
    // do not grow 10× when facts do)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      writeIfAbsent(t)(spark.read.parquet(s"$sfDir/$t.parquet"))
    }
  }
}

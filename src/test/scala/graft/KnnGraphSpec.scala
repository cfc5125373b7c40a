package graft

import org.apache.spark.sql.functions._

import graft.operators.KnnGraph

/** K3 persisted k-NN graph layout (round 14): disk round-trip identity,
  * partition-pruned frontier probes, disk-vs-memory search parity, and
  * incremental-append reachability through the reverse links.
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)

  private def freshDir(): String = Tables.scratchDir("knng-spec") + "/g"

  test("writeGraph/readGraph round-trip is content-exact and partitioned by _srcb") {
    val g = KnnGraph.build(emb, "vec_id", "embedding", dim = 64,
      k = 5, nPlanes = 6, nTables = 3)
    val dir = freshDir()
    KnnGraph.writeGraph(g,
      KnnGraph.bucketed(emb, "vec_id", "embedding", 64, 6, 3), dir, buckets = 16)
    val dg = KnnGraph.readGraph(spark, dir)
    assert(dg.buckets == 16)
    val mem = g.select("vec_id", "nbr_id", "sim", "nbr_rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val disk = dg.edges.select("vec_id", "nbr_id", "sim", "nbr_rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(disk == mem, "the persisted layout must hold exactly the built graph")
    // the layout is hive-partitioned: _srcb is a partition column
    assert(dg.edges.columns.contains("_srcb"))
    assert(new java.io.File(s"$dir/edges").listFiles()
      .exists(_.getName.startsWith("_srcb=")), "expected _srcb= directories")
  }

  test("the frontier probe is PARTITION-PRUNED at the scan") {
    val dir = freshDir()
    KnnGraph.writeGraph(
      KnnGraph.build(emb, "vec_id", "embedding", 64, 5, 6, 3),
      KnnGraph.bucketed(emb, "vec_id", "embedding", 64, 6, 3), dir, buckets = 16)
    val dg = KnnGraph.readGraph(spark, dir)
    val frontier = Seq(1L, 2L, 17L)
    val probe = dg.edges.filter(
      col("_srcb").isin(frontier.map(_ % dg.buckets).distinct: _*) &&
        col("vec_id").isin(frontier: _*))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_srcb"),
      s"the _srcb predicate must reach the scan as a PartitionFilter:\n$plan")
    // and the pruned scan reads fewer files than the full layout holds
    val scanned = probe.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scanned.nonEmpty)
    // semantic check: pruning must not lose rows
    val want = dg.edges.filter(col("vec_id").isin(frontier: _*)).count()
    assert(probe.count() == want)
  }

  test("search over the disk layout equals search over the in-memory graph") {
    val g = KnnGraph.build(emb, "vec_id", "embedding", 64, 5, 6, 3)
    val dir = freshDir()
    KnnGraph.writeGraph(g,
      KnnGraph.bucketed(emb, "vec_id", "embedding", 64, 6, 3), dir, buckets = 16)
    val dg = KnnGraph.readGraph(spark, dir)
    val entry = emb.agg(max("vec_id")).head.getLong(0)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("sim")).as[(Long, Double)].collect().toSeq
    val memRes = rows(KnnGraph.searchGraph(g, emb, "vec_id", "embedding",
      q, entry, k = 10, beam = 8, rounds = 3).orderBy(col("sim").desc, col("vec_id")))
    val diskRes = rows(KnnGraph.searchGraph(dg, emb, "vec_id", "embedding",
      q, entry, k = 10, beam = 8, rounds = 3).orderBy(col("sim").desc, col("vec_id")))
    assert(diskRes == memRes)
  }

  test("appendToGraph: new nodes gain ranked adjacency and are REACHABLE via reverse links") {
    val standing = emb.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val batch = emb.filter(pmod(col("vec_id"), lit(10)) === 7)
    val nBatch = batch.count()
    assert(nBatch > 0, "corpus must provide a batch slice")
    val dir = freshDir()
    KnnGraph.writeGraph(
      KnnGraph.build(standing, "vec_id", "embedding", 64, 5, 6, 3),
      KnnGraph.bucketed(standing, "vec_id", "embedding", 64, 6, 3),
      dir, buckets = 16)
    val newAdj = KnnGraph.appendToGraph(spark, dir, batch, emb,
      "vec_id", "embedding", dim = 64, k = 5, nPlanes = 6, nTables = 3)
    // every placed node has 1..5 ranked neighbors, none pointing at itself
    val perNode = newAdj.groupBy("vec_id").agg(count(lit(1)).as("n"))
    assert(perNode.filter(col("n") > 5).count() == 0)
    assert(newAdj.filter(col("vec_id") === col("nbr_id")).count() == 0)
    // the layout now holds the append: ranked new rows + reverse links
    val dg = KnnGraph.readGraph(spark, dir)
    val onDisk = dg.edges.filter(pmod(col("vec_id"), lit(10)) === 7 &&
      col("nbr_rank") >= 1).count()
    assert(onDisk == newAdj.count())
    val reverse = dg.edges.filter(col("nbr_rank") === 0)
    assert(reverse.count() > 0, "reverse reachability links must land")
    // REACHABILITY: walking from a STANDING entry must be able to visit a
    // new node — pick a new node, query with its own vector, start from
    // one of its reverse-link sources (a standing node that now points at
    // it); one round suffices by construction
    val probe = newAdj.select("vec_id").as[Long].head()
    val src = dg.edges.filter(col("nbr_id") === probe &&
        pmod(col("vec_id"), lit(10)) =!= 7)
      .select("vec_id").as[Long].head()
    val q = emb.filter(col("vec_id") === probe)
      .select(col("embedding").as("q_vec"))
    val visited = KnnGraph.searchGraph(dg, emb, "vec_id", "embedding",
      q, entryId = src, k = 10, beam = 8, rounds = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(visited.contains(probe),
      s"new node $probe must be reachable from standing node $src via reverse links")
  }
}

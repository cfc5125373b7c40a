package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.functions.VectorExpressions.cosineFast

/** K3 (EXT): distributed k-NN GRAPH construction — every vector's top-k
  * cosine neighbors, the all-nodes counterpart of the single-query ANN
  * ladder and the substrate that SemDeDup-style clustering, graph-based
  * ANN serving (HNSW/NSG start from exactly this artifact), label
  * propagation, and local-density corpus diagnostics all consume.
  *
  * Scale design (the NN-Descent shape — Dong, Moses & Li, WWW'11 — seeded
  * by multi-table hyperplane LSH instead of random pairs so round 0 is
  * already locality-aware AND deterministic):
  *
  *  1. SEED. `nTables` independent hyperplane-LSH signatures per vector
  *     (seeds `seed..seed+nTables-1`, the [[graft.functions
  *     .VectorFunctions.hyperplaneSig]] family). Each (table, bucket)
  *     group of size 2..maxBucket emits its directed in-bucket pairs —
  *     candidate volume is Σ bucket² per table, capped by `maxBucket`,
  *     NEVER an n² term. Exact cosine on candidates, per-node top-k via
  *     one window (`row_number` over sim desc, id asc — both sides of
  *     every tie deterministic).
  *  2. REFINE (one NN-Descent round). Neighbors-of-neighbors: join the
  *     seed graph to itself on v (u→v, v→w ⇒ candidate u→w), union the
  *     existing edges, re-score, re-top-k. Cost ∝ n·k² candidate rows —
  *     linear in corpus size; each further round is the same bound. One
  *     round is declared (each round is one self-join + one window — the
  *     100 TB operator is this stage run to convergence, and convergence
  *     adds rounds, not new machinery).
  *
  * Everything after the (foldable-literal) hyperplane projection is plain
  * joins/aggregates/windows — Catalyst shuffles on `_a`/`_b` ids and the
  * vectors travel only into the two scoring joins (Vernica-style: the
  * candidate-pair stream carries 16 bytes/pair on the wire, not 2×dim
  * doubles). Sims are rounded to 6 dp BEFORE ranking so the rank order is
  * reproducible independently of accumulation order (the repo-wide
  * float-determinism rule the DuckDB oracle relies on).
  *
  * Reference scope: the reference engine has no vector surface at all —
  * this extends its analytics API the way SURVEY.md §2.K3 prescribes.
  */
object KnnGraph {

  /** Bucketed ids for the LSH seeding stage: (_id, _tbl, _bucket), one row
    * per (vector, table). Exposed so the declared query can materialize
    * the exact bucket artifact its DuckDB oracle re-derives the graph
    * from.
    */
  def bucketed(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nPlanes: Int,
      nTables: Int,
      seed: Long = 42L): DataFrame = {
    val v = VectorFunctions.asDouble(col(vecCol))
    val sigs = array((0 until nTables).map { t =>
      VectorFunctions.hyperplaneSig(v, dim, nPlanes, seed + t)
    }: _*)
    graft.Tables.fanOut(emb)
      .select(col(idCol).cast("long").as("_id"),
        posexplode(sigs).as(Seq("_tbl", "_bucket")))
  }

  /** Build the k-NN graph: seed from LSH buckets, refine with
    * `refineRounds` NN-Descent rounds.
    *
    * @return (vec_id, nbr_id, sim, nbr_rank) — ≤ k rows per source node,
    *         nbr_rank 1..k by descending rounded cosine, id-ascending ties.
    */
  def build(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int = 5,
      nPlanes: Int = 6,
      nTables: Int = 3,
      maxBucket: Int = 256,
      refineRounds: Int = 1,
      seed: Long = 42L): DataFrame = {
    val vecs = graft.Tables.fanOut(emb)
      .select(col(idCol).cast("long").as("_id"),
        VectorFunctions.asDouble(col(vecCol)).as("_v"))

    // Seed candidates: directed in-bucket pairs from every table, capped.
    // sort_array makes the collect_list order canonical (collect_list
    // itself is order-nondeterministic); the explode² emits both
    // directions so each node ranks its own list.
    val cand0 = bucketed(emb, idCol, vecCol, dim, nPlanes, nTables, seed)
      .groupBy("_tbl", "_bucket")
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(col("_ids")).between(2, maxBucket))
      .select(explode(col("_ids")).as("_a"), col("_ids"))
      .select(col("_a"), explode(col("_ids")).as("_b"))
      .filter(col("_a") =!= col("_b"))
      .distinct()

    val w = Window.partitionBy("_a")
      .orderBy(col("_sim").desc, col("_b").asc)

    def topK(pairs: DataFrame): DataFrame =
      pairs
        .join(vecs.select(col("_id").as("_a"), col("_v").as("_va")), Seq("_a"))
        .join(vecs.select(col("_id").as("_b"), col("_v").as("_vb")), Seq("_b"))
        .select(col("_a"), col("_b"),
          round(cosineFast(col("_va"), col("_vb")), 6).as("_sim"))
        .withColumn("_rk", row_number().over(w))
        .filter(col("_rk") <= k)

    var g = topK(cand0)
    for (_ <- 0 until refineRounds) {
      val e = g.select("_a", "_b")
      // u→v→w wedges plus the standing edges: the union keeps refinement
      // monotone per node (the old top-k is always in the candidate set).
      val cand = e.as("x")
        .join(e.as("y"), col("x._b") === col("y._a"))
        .filter(col("x._a") =!= col("y._b"))
        .select(col("x._a").as("_a"), col("y._b").as("_b"))
        .union(e)
        .distinct()
      g = topK(cand)
    }
    g.select(col("_a").as("vec_id"), col("_b").as("nbr_id"),
      col("_sim").as("sim"), col("_rk").as("nbr_rank"))
  }

  /** A persisted k-NN graph: `edges` hive-partitioned by
    * `_srcb = vec_id % buckets` so a beam-search frontier probe prunes
    * PARTITIONS ON DISK (the [[graft.operators.PqAnn.writeIvfAdcIndex]]
    * pattern — the probe filter becomes a PartitionFilter at the scan);
    * the LSH bucket artifact rides along so incremental appends place new
    * vectors without re-bucketing the standing corpus.
    */
  final case class DiskGraph(edges: DataFrame, buckets: Int, path: String)

  /** Persist a built graph as the serving layout. `buckets` sizes the
    * partition grid — production picks corpus/buckets ≈ a few hundred MB
    * so a frontier probe touches `beam` directories, not the graph.
    */
  def writeGraph(graph: DataFrame, bucketArtifact: DataFrame, path: String,
      buckets: Int = 16): Unit = {
    graph
      .withColumn("_srcb", pmod(col("vec_id"), lit(buckets)))
      .repartition(col("_srcb"))
      .write.partitionBy("_srcb").mode("overwrite").parquet(s"$path/edges")
    bucketArtifact.write.mode("overwrite").parquet(s"$path/buckets")
    // meta.json goes through the Hadoop FileSystem of the layout's scheme
    // (NOT java.nio): edges/buckets land wherever `path` points (hdfs://,
    // s3a://); a local-only nio write would fail or strand meta elsewhere
    val meta = s"""{"buckets":$buckets}"""
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "meta.json"), true)
    try out.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readGraph(spark: org.apache.spark.sql.SparkSession, path: String): DiskGraph = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(root, "meta.json"))
    val meta = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val buckets = """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(meta)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"$path/meta.json lacks buckets"))
    DiskGraph(spark.read.parquet(s"$path/edges"), buckets, path)
  }

  /** INCREMENTAL graph maintenance — the HNSW-insert shape, sibling of
    * [[graft.operators.PqAnn.appendToIndex]]: place each NEW vector via the
    * FROZEN LSH bucketing (signatures are pure per-vector functions, so
    * the batch re-buckets without touching the standing corpus), take
    * candidates from (a) standing rows sharing a (table, bucket) — the
    * standing artifact is scanned once and the BATCH side broadcasts, so
    * no standing bytes ever shuffle — capped at `maxBucket` standing
    * members per group, and (b) batch-internal pairs (groups of 2..cap);
    * exact-cosine top-k per new node becomes its adjacency.
    *
    * Reachability: for every new edge u_new→v, the REVERSE edge
    * v→u_new is appended with `nbr_rank = 0` (an unranked supplementary
    * link, the NN-Descent reverse-edge trick) — without it no standing
    * walk could ever reach a new node. Old nodes' RANKED lists stay
    * frozen (the FAISS add()-after-train() contract; periodic rebuild
    * restores global top-k optimality — a retrain-policy concern, not
    * this operator's).
    *
    * Cost ∝ batch × bucket occupancy: the standing corpus is never
    * re-bucketed, re-scored against itself, or rewritten — new files land
    * in existing `_srcb=` partitions (partitioned APPEND, like the IVF
    * append). Returns the new nodes' ranked adjacency (what a rebuild's
    * top-k over the same candidate set would hold — the declared query's
    * oracle re-derives it from the written bucket artifact).
    */
  def appendToGraph(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      batchEmb: DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int = 5,
      nPlanes: Int = 6,
      nTables: Int = 3,
      maxBucket: Int = 256,
      seed: Long = 42L): DataFrame = {
    val dg = readGraph(spark, path)
    val newBuckets = bucketed(batchEmb, idCol, vecCol, dim, nPlanes, nTables, seed)
    val standing = spark.read.parquet(s"$path/buckets")
    // standing groups capped like build: a hot bucket's candidate fan-in
    // is bounded whatever the corpus size
    val okGroups = standing.groupBy("_tbl", "_bucket")
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucket)
      .select("_tbl", "_bucket")
    val candOld = standing.join(broadcast(okGroups), Seq("_tbl", "_bucket"))
      .join(broadcast(newBuckets.select(col("_id").as("_a"),
        col("_tbl"), col("_bucket"))), Seq("_tbl", "_bucket"))
      .select(col("_a"), col("_id").as("_b"))
    val candNew = newBuckets
      .groupBy("_tbl", "_bucket")
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(col("_ids")).between(2, maxBucket))
      .select(explode(col("_ids")).as("_a"), col("_ids"))
      .select(col("_a"), explode(col("_ids")).as("_b"))
      .filter(col("_a") =!= col("_b"))
    val cand = candOld.union(candNew).distinct()
    val bv = batchEmb.select(col(idCol).cast("long").as("_a"),
      VectorFunctions.asDouble(col(vecCol)).as("_va"))
    val av = emb.select(col(idCol).cast("long").as("_b"),
      VectorFunctions.asDouble(col(vecCol)).as("_vb"))
    val w = Window.partitionBy("_a").orderBy(col("_sim").desc, col("_b").asc)
    val newAdj = cand
      .join(broadcast(bv), Seq("_a"))
      .join(av, Seq("_b"))
      .select(col("_a"), col("_b"),
        round(cosineFast(col("_va"), col("_vb")), 6).as("_sim"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .select(col("_a").as("vec_id"), col("_b").as("nbr_id"),
        col("_sim").as("sim"), col("_rk").as("nbr_rank"))
      .localCheckpoint(true) // two writes below must see ONE evaluation
    val reverse = newAdj.select(col("nbr_id").as("vec_id"),
      col("vec_id").as("nbr_id"), col("sim"), lit(0).as("nbr_rank"))
    newAdj.unionByName(reverse)
      .withColumn("_srcb", pmod(col("vec_id"), lit(dg.buckets)))
      .repartition(col("_srcb"))
      .write.partitionBy("_srcb").mode("append").parquet(s"$path/edges")
    newBuckets.write.mode("append").parquet(s"$path/buckets")
    newAdj
  }

  /** Greedy BEAM SEARCH over a built k-NN graph — the serving leg of
    * graph-based ANN (HNSW/NSG answer queries exactly this way: walk the
    * neighbor graph toward the query, keep the best `beam` frontier,
    * answer from everything visited). `rounds` is fixed and unrolled
    * (production runs to convergence; each extra round is the same
    * machinery), so the walk is deterministic and a SQL oracle can replay
    * it.
    *
    * Scale design: per round the work is one id-pushed edge-list probe
    * (frontier is ≤ `beam` literal ids — partition-prunable when the
    * graph is written bucketed by source id) + one scoring pass over
    * ≤ beam·(k+1) candidates against the broadcast query vector. The
    * only driver terms are the ≤beam-row frontier collects — bounded at
    * any corpus size.
    *
    * @param graph  edges from [[build]]: (vec_id, nbr_id, …)
    * @param emb    the vector corpus (idCol, vecCol, carry columns)
    * @return top-`k` of the visited set: (idCol, label, sim)
    */
  def searchGraph(
      graph: DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: DataFrame, // one row: (q_vec: array<double|float>)
      entryId: Long,
      k: Int = 10,
      beam: Int = 8,
      rounds: Int = 3): DataFrame =
    searchImpl(frontier => graph
        .filter(col("vec_id").isin(frontier: _*))
        .select(col("nbr_id").as("_cand")),
      emb, idCol, vecCol, queryVec, entryId, k, beam, rounds)

  /** Beam search over the PERSISTED layout: the frontier probe carries the
    * `_srcb IN (frontier % buckets)` partition predicate, so each round's
    * edge fetch reads ≤ `beam` DIRECTORIES of the on-disk graph (shows as
    * PartitionFilters at the scan — asserted in KnnGraphSpec), never the
    * whole edge set. This is what makes graph serving viable when the
    * graph itself is 100 TB-adjacent: the walk's I/O is ∝ beam × rounds.
    */
  def searchGraph(
      dg: DiskGraph,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: DataFrame,
      entryId: Long,
      k: Int,
      beam: Int,
      rounds: Int): DataFrame =
    searchImpl(frontier => dg.edges
        // floorMod, not JVM %: writeGraph bucketed with pmod, whose result
        // is non-negative — a negative vec_id probed with % would miss its
        // partition silently
        .filter(col("_srcb").isin(
            frontier.map(id => Math.floorMod(id, dg.buckets.toLong)).distinct: _*) &&
          col("vec_id").isin(frontier: _*))
        .select(col("nbr_id").as("_cand")),
      emb, idCol, vecCol, queryVec, entryId, k, beam, rounds)

  /** Beam-walk core: one Spark job per round with a bounded (≤ beam ids)
    * driver-side frontier collect, partition-pruned at the scan. The right
    * shape for BATCH serving (scoring a query set against a standing
    * graph); interactive single-query serving at production latency wants
    * an external index process holding the graph resident — the layout
    * [[writeGraph]] persists is exactly what such a server would load.
    */
  private def searchImpl(
      expand: Seq[Long] => DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: DataFrame,
      entryId: Long,
      k: Int,
      beam: Int,
      rounds: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    def scored(ids: DataFrame): DataFrame =
      ids.join(emb, ids("_cand") === emb(idCol))
        .crossJoin(broadcast(queryVec))
        .select(col(idCol), col("label"),
          round(cosineFast(col(vecCol), col("q_vec")), 6).as("sim"))

    var frontier: Seq[Long] = Seq(entryId)
    var visited: Option[DataFrame] = None
    for (_ <- 1 to rounds) {
      val frontierDf = frontier.toDF("_cand")
      val cand = expand(frontier)
        .union(frontierDf)
        .distinct()
      val s = scored(cand)
      // bounded collect: ≤ beam rows — the next round's probe literals
      frontier = s.orderBy(col("sim").desc, col(idCol).asc)
        .limit(beam).select(idCol).as[Long].collect().toSeq
      visited = Some(visited.map(_.union(s)).getOrElse(s))
    }
    visited.get.dropDuplicates(idCol)
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.cosineFast
import graft.functions.VectorFunctions.asDouble

/** IVF (inverted-file) approximate nearest neighbour — the data-adaptive
  * complement to the hyperplane-LSH path (SURVEY.md §2.K3 names both as the
  * scale path): a k-means coarse quantizer splits the corpus into `nLists`
  * cells, a query probes only its `nProbe` nearest cells, and exact cosine
  * runs on that subset. Where LSH cells are random halfspaces, IVF cells
  * follow the corpus's own cluster structure — better recall at equal probe
  * cost on clustered embeddings (the realistic case for model embeddings).
  *
  * Scale design:
  *  - training is Lloyd's iterations as pure DataFrame ops: assignment is a
  *    codegen'd argmin over `nLists` dot products per row (centroids are a
  *    broadcast-sized literal — nLists × dim doubles); the per-cell mean is
  *    one hash aggregate. Only `nLists` rows ever reach the driver.
  *  - at deployment the tagged corpus is WRITTEN partitioned by `_list`, so
  *    probing prunes to nProbe directories of ~|corpus|/nLists vectors; the
  *    in-memory form here filters on `_list IN probes`, which Catalyst
  *    turns into the same pruning over a partitioned layout.
  *  - centroid count is the recall/cost knob: E[probed fraction] =
  *    nProbe/nLists.
  */
object IvfAnn {

  /** Argmin cell id — one native expression holding the centroid matrix
    * ([[graft.functions.NearestCentroidExpr]]); a greatest-over-structs
    * Column formulation with literal arrays blows generated code past JIT
    * limits and runs ~25× slower.
    */
  private def nearestCell(v: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.VectorExpressions.nearestCentroid(v, centroids)

  /** Train `nLists` centroids with `iters` Lloyd's iterations.
    * Deterministic: init picks the `nLists` rows with the smallest seeded
    * id hash; every step is a deterministic aggregate. A cell that loses
    * all members keeps its previous centroid.
    */
  /** `trainSampleMod` hash-samples the training set to ~1/mod of the corpus
    * (deterministic: keep rows where xxhash64(id, seed) % mod == 0). Lloyd's
    * converges on a representative sample — at 100 TB you train on ~1e6
    * vectors, not the corpus, then assign ALL vectors once in [[index]].
    */
  def trainCentroids(
      emb: DataFrame, vecCol: String, idCol: String, dim: Int,
      nLists: Int, iters: Int = 5, seed: Long = 42L,
      trainSampleMod: Int = 1): Array[Array[Double]] = {
    require(nLists >= 1 && iters >= 0 && trainSampleMod >= 1)
    // Both the seed collect and every Lloyd's iteration read this set:
    // persist it once instead of paying (iters + 1)× parquet scans + casts
    // (at scale this is the difference between one pass over the sample and
    // iters+1 passes over storage). MEMORY_AND_DISK: a sample that outgrows
    // memory spills rather than thrashing recomputation.
    val base = graft.Tables.fanOut(emb)
      .select(asDouble(col(vecCol)).as("_v"), xxhash64(col(idCol), lit(seed)).as("_h"))
      .filter(size(col("_v")) === dim)
    val sampled = if (trainSampleMod > 1)
        base.filter(pmod(col("_h"), lit(trainSampleMod)) === 0)
      else base
    val data = sampled
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def toArr(row: org.apache.spark.sql.Row, field: Int): Array[Double] =
      row.getSeq[Double](field).toArray

    try {
      // seeds come from the (persisted) training sample too — the smallest
      // hashes within it are just as arbitrary-deterministic as within the
      // full corpus, and this keeps training to a single storage pass
      var centroids: Array[Array[Double]] = data
        .orderBy("_h").limit(nLists)
        .select("_v").collect().map(toArr(_, 0))
      require(centroids.nonEmpty, "empty training set")

      (0 until iters).foreach { _ =>
        val means = data
          .withColumn("_cell", nearestCell(col("_v"), centroids))
          .groupBy("_cell")
          .agg(array((0 until dim).map(i => avg(col("_v").getItem(i))): _*).as("_mean"))
          .collect()
          .map(r => r.getInt(0) -> toArr(r, 1)).toMap
        centroids = centroids.indices
          .map(i => means.getOrElse(i, centroids(i))).toArray
      }
      centroids
    } finally data.unpersist(blocking = false)
  }

  /** Tag each corpus vector with its IVF cell. Wrong-dimension vectors are
    * EXCLUDED (same `size = dim` rule training applies) — a truncated dot
    * product would otherwise assign them a plausible-looking cell and feed
    * mismatched lengths into cosine scoring.
    */
  def index(emb: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val dim = centroids.head.length
    graft.Tables.fanOut(emb)
      .withColumn("_v", asDouble(col(vecCol)))
      .filter(size(col("_v")) === dim)
      .withColumn("_list", nearestCell(col("_v"), centroids))
  }

  /** The `nProbe` cells nearest to query `q` under cosine-compatible
    * (squared-distance-to-halved-norm) ordering — the probe-selection rule
    * shared by the in-memory and written-layout paths.
    */
  def nearestProbes(q: Array[Double], centroids: Array[Array[Double]],
      nProbe: Int): Seq[Int] =
    centroids.indices
      .sortBy { i =>
        val c = centroids(i)
        c.map(x => x * x).sum / 2.0 - q.zip(c).map { case (a, b) => a * b }.sum
      }
      .take(math.min(nProbe, centroids.length))

  /** Exact cosine top-k over only the probed cells of an already-tagged
    * corpus (`_v` vector + `_list` cell columns, i.e. [[index]] output —
    * in memory or read back from a [[writeIndex]] layout, where the
    * `_list` filter becomes PARTITION pruning at the scan).
    */
  def probeTopK(tagged: DataFrame, idCol: String, q: Array[Double],
      centroids: Array[Array[Double]], k: Int, nProbe: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    val probes = nearestProbes(q, centroids, nProbe)
    // broadcast one-row query vector built from the ALREADY-collected q —
    // re-filtering `tagged` here would scan (and re-assign) the corpus a
    // second time just to recover a row the driver is holding. Not a
    // 64-literal array either: that inflates generated cosine code.
    val session = tagged.sparkSession
    import session.implicits._
    val qRow = broadcast(Seq(Tuple1(q.toSeq)).toDF("_q_vec"))
    tagged
      .filter(col("_list").isin(probes.map(Integer.valueOf): _*))
      .crossJoin(qRow)
      .select(col(idCol) +: carryCols.map(col) :+
        round(cosineFast(col("_v"), col("_q_vec")), 6).as("sim"): _*)
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Write the tagged corpus in the DEPLOYMENT layout: hive-partitioned by
    * IVF cell, one directory per `_list` value, so [[probeTopK]]'s cell
    * filter prunes the scan to `nProbe` directories of ~|corpus|/nLists
    * vectors (PlanShapeSpec asserts the pruning on the physical plan; a
    * full scan would defeat the entire point of IVF at 100 TB).
    * `repartition(_list)` keeps output to one file per cell per shuffle
    * partition instead of #input-partitions × #cells fragments. The
    * original float vector column is DROPPED — `_v` (the double form
    * probing reads) already carries the values, and storing both would
    * triple the vector bytes of the layout at corpus scale.
    */
  def writeIndex(emb: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], path: String): Unit =
    index(emb, vecCol, centroids)
      .drop(vecCol)
      .repartition(col("_list"))
      .write.partitionBy("_list").mode("overwrite").parquet(path)

  /** Approximate top-k by cosine for the corpus vector with id `queryId`:
    * probe the `nProbe` cells nearest the query, exact cosine inside them.
    * `carryCols` names extra columns of `emb` to carry into the output
    * alongside (idCol, sim) — the operator itself assumes nothing about the
    * corpus schema beyond id + vector.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      dim: Int, k: Int, nLists: Int = 16, nProbe: Int = 4,
      iters: Int = 5, seed: Long = 42L,
      carryCols: Seq[String] = Nil, trainSampleMod: Int = 1): DataFrame =
    ivfTopKWith(emb, idCol, vecCol, queryId, k, nProbe,
      trainCentroids(emb, vecCol, idCol, dim, nLists, iters, seed,
        trainSampleMod),
      carryCols)

  /** [[ivfTopK]] over ALREADY-trained centroids — the deployment split
    * (train once, query many) and the hook callers use to materialize the
    * trained quantizer (e.g. as an oracle artifact).
    */
  def ivfTopKWith(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nProbe: Int,
      centroids: Array[Array[Double]],
      carryCols: Seq[String] = Nil): DataFrame = {
    val tagged = index(emb, vecCol, centroids)
    // one-row collect of the query vector — the same driver cost as the
    // broadcast-query-vector pattern, used to pick the probe cells
    val q = tagged.filter(col(idCol) === queryId)
      .select(col("_v")).head().getSeq[Double](0).toArray
    probeTopK(tagged, idCol, q, centroids, k, nProbe, carryCols)
  }
}

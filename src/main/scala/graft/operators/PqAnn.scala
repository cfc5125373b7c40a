package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.cosineFast
import graft.functions.VectorFunctions.asDouble

/** Product quantization (PQ) with asymmetric distance computation (ADC) —
  * the third leg of the K3 similarity-search scale path beside
  * hyperplane-LSH and IVF, and the one that attacks the MEMORY term: a
  * `dim`-float vector compresses to `m` byte-sized codes (64 floats →
  * 8 codes here, 32× smaller), and a query scores the ENTIRE compressed
  * corpus through m table lookups per vector instead of dim multiplies
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — the IVF-PQ construction every billion-vector ANN system
  * builds on).
  *
  * Construction:
  *  - TRAIN: the vector space splits into `m` orthogonal subspaces of
  *    `dim/m` dims; each subspace trains its own `k`-centroid codebook via
  *    the SAME seeded deterministic Lloyd's the IVF quantizer uses
  *    ([[IvfAnn.trainCentroids]] on the sliced column — per-subspace seeds,
  *    hash-sampled training set). Driver state: m × k × (dim/m) doubles =
  *    dim × k — constant in corpus size.
  *  - ENCODE: per subspace, a native [[graft.functions.NearestCentroidExpr]]
  *    argmin assigns the code (codegen-friendly primitive loop; ties to the
  *    larger code, the expression's documented rule). One scan, zero
  *    shuffle; codes are plain INT columns a layout would store as bytes.
  *  - ADC SCORE: the driver builds the m×k lookup tables
  *    `t_j[c] = ⟨q_sub_j, codebook_j[c]⟩` (dim multiplies TOTAL, once per
  *    query) and ships them as literal arrays; each corpus vector's
  *    approximate inner product is `Σ_j t_j[code_j]` — m `element_at`s and
  *    m−1 adds per row, no vector arithmetic at all. Shortlist =
  *    TakeOrdered over that score.
  *  - RERANK: exact cosine on the shortlist only (broadcast one-row query,
  *    the [[IvfAnn.probeTopK]] pattern), so the final top-k is
  *    full-precision while the corpus-wide pass touched only codes.
  *
  * At 100 TB the corpus-wide pass reads m bytes + an id per vector rather
  * than dim floats — the difference between scanning 100 TB and scanning
  * ~3 TB — and composes with the IVF layout (probe cells first, ADC within
  * them). Recall follows the shortlist width: exact for neighbours whose
  * quantized score survives the cut; `shortlist` is the knob.
  */
object PqAnn {

  /** Per-subspace codebooks: `codebooks(j)(c)` = centroid `c` of subspace
    * `j`. Deterministic (seeded per subspace), trained on a hash-sampled
    * subset like the IVF quantizer.
    */
  def trainCodebooks(emb: DataFrame, vecCol: String, idCol: String,
      dim: Int, m: Int, k: Int, iters: Int = 3,
      trainSampleMod: Int = 1): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val dsub = dim / m
    (0 until m).map { j =>
      val sub = emb.select(col(idCol),
        slice(col(vecCol), j * dsub + 1, dsub).as(vecCol))
      IvfAnn.trainCentroids(sub, vecCol, idCol, dsub, k, iters,
        seed = 42L + j, trainSampleMod = trainSampleMod)
    }.toArray
  }

  /** Tag each corpus vector with its m PQ codes (`_c0.._c{m-1}` INT
    * columns) plus the double vector `_v`. Wrong-dimension vectors are
    * excluded (the IVF `size = dim` rule).
    */
  def encode(emb: DataFrame, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val dim = m * dsub
    val base = graft.Tables.fanOut(emb)
      .withColumn("_v", asDouble(col(vecCol)))
      .filter(size(col("_v")) === dim)
    (0 until m).foldLeft(base) { (df, j) =>
      df.withColumn(s"_c$j",
        graft.functions.VectorExpressions.nearestCentroid(
          slice(col("_v"), j * dsub + 1, dsub), codebooks(j)))
    }
  }

  /** Approximate top-k for the corpus vector with id `queryId`: ADC
    * shortlist over the codes, exact-cosine rerank of the shortlist.
    * `carryCols` ride through to the output like the IVF path's.
    */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, codebooks: Array[Array[Array[Double]]],
      shortlist: Int = 50, carryCols: Seq[String] = Nil): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val coded = encode(emb, vecCol, codebooks)
    // one-row collect of the query vector — same bounded driver cost as
    // the IVF probe selection / broadcast-query patterns
    val q = coded.filter(col(idCol) === queryId)
      .select(col("_v")).head().getSeq[Double](0).toArray
    val short = coded.withColumn("_adc", adcScore(q, codebooks))
      .orderBy(col("_adc").desc, col(idCol))
      .limit(shortlist)
    rerank(short, idCol, q, k, carryCols)
  }

  /** The ADC score column `Σ_j t_j[code_j]` for query `q` over `_c*` code
    * columns: the driver precomputes the m×k lookup tables
    * `t_j[c] = ⟨q_sub_j, codebook_j[c]⟩` (sequential index order — the same
    * IEEE summation the oracle's list_sum performs) and ships them as
    * literals, so the per-row cost is m `element_at`s and m−1 adds.
    */
  private def adcScore(q: Array[Double],
      codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val tables: Array[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, j) =>
      cb.map { c =>
        var s = 0.0
        var i = 0
        while (i < dsub) { s += q(j * dsub + i) * c(i); i += 1 }
        s
      }.toSeq
    }
    (0 until m)
      .map(j => element_at(typedLit(tables(j)), col(s"_c$j") + 1))
      .reduce(_ + _)
  }

  /** Exact-cosine rerank of an ADC shortlist (broadcast one-row query —
    * the [[IvfAnn.probeTopK]] pattern): full-precision final top-k while
    * only `shortlist` vectors ever see real arithmetic.
    */
  private def rerank(short: DataFrame, idCol: String, q: Array[Double],
      k: Int, carryCols: Seq[String]): DataFrame = {
    val session = short.sparkSession
    import session.implicits._
    val qRow = broadcast(Seq(Tuple1(q.toSeq)).toDF("_q_vec"))
    short
      .crossJoin(qRow)
      .select(col(idCol) +: carryCols.map(col) :+
        round(cosineFast(col("_v"), col("_q_vec")), 6).as("sim"): _*)
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF-ADC — the composed construction Jégou et al. §V actually deploy
    * (and FAISS ships as `IVFx,PQy` with `by_residual=false`): a coarse
    * k-means quantizer partitions the corpus into cells, the query probes
    * only the `nProbe` nearest cells, and WITHIN the probed cells the
    * scoring is PQ/ADC over codes — so at 100 TB a query touches
    * `nProbe/nLists` of the corpus AND reads only m bytes per touched
    * vector (with the [[IvfAnn.writeIndex]] hive layout, the cell filter
    * is partition pruning at the scan: directories never opened, codes
    * never decoded). Exact cosine runs on the `shortlist` only.
    *
    * Cell assignment uses the raw-vector codebooks (not residuals): codes
    * stay valid across cells, one codebook set serves the whole corpus,
    * and the oracle can re-derive every step from the two written
    * artifacts (coarse centroids + per-subspace codebooks).
    */
  def ivfAdcTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nProbe: Int = 4, shortlist: Int = 50,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val coded = encode(emb, vecCol, codebooks)
      .withColumn("_list",
        graft.functions.VectorExpressions.nearestCentroid(col("_v"), centroids))
    val q = coded.filter(col(idCol) === queryId)
      .select(col("_v")).head().getSeq[Double](0).toArray
    adcProbeTopK(coded, idCol, q, centroids, codebooks, k, nProbe,
      shortlist, carryCols)
  }

  /** ADC shortlist + exact rerank over an ALREADY cell-tagged + encoded
    * corpus (`_v`, `_c*`, `_list` columns — in memory or read back from a
    * [[writeIvfAdcIndex]] layout, where the probe filter becomes partition
    * pruning at the scan).
    */
  def adcProbeTopK(coded: DataFrame, idCol: String, q: Array[Double],
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], k: Int, nProbe: Int,
      shortlist: Int = 50, carryCols: Seq[String] = Nil): DataFrame = {
    val probes = IvfAnn.nearestProbes(q, centroids, nProbe)
    val short = coded
      .filter(col("_list").isin(probes.map(Integer.valueOf): _*))
      .withColumn("_adc", adcScore(q, codebooks))
      .orderBy(col("_adc").desc, col(idCol))
      .limit(shortlist)
    rerank(short, idCol, q, k, carryCols)
  }

  /** The residual of each vector against its coarse cell's centroid:
    * `_r = _v − c(_list)` element-wise. The centroid matrix rides as ONE
    * nested literal; the subtraction is a codegen'd `zip_with`.
    */
  private def residualCol(centroids: Array[Array[Double]]): Column =
    zip_with(col("_v"),
      element_at(typedLit(centroids.map(_.toSeq).toSeq), col("_list") + 1),
      (a, b) => a - b)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** RESIDUAL per-subspace codebooks (Jégou et al. §V, `by_residual=true`
    * — FAISS's default for `IVFx,PQy`): codebooks train on `r = v −
    * c(cell)` instead of raw vectors. Residuals concentrate near zero
    * with far smaller within-cell spread than the raw corpus, so the same
    * m×k code budget spends its resolution on exactly the part of `v` the
    * coarse quantizer did NOT explain — materially better recall at equal
    * m. Same seeded deterministic Lloyd's per subspace (distinct seed
    * base, so residual and raw codebooks never alias).
    */
  def trainResidualCodebooks(emb: DataFrame, vecCol: String, idCol: String,
      dim: Int, m: Int, k: Int, centroids: Array[Array[Double]],
      iters: Int = 3, trainSampleMod: Int = 1): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val dsub = dim / m
    val base = withResidual(emb, vecCol, dim, centroids)
    (0 until m).map { j =>
      val sub = base.select(col(idCol),
        slice(col("_r"), j * dsub + 1, dsub).as(vecCol))
      IvfAnn.trainCentroids(sub, vecCol, idCol, dsub, k, iters,
        seed = 1042L + j, trainSampleMod = trainSampleMod)
    }.toArray
  }

  private def withResidual(emb: DataFrame, vecCol: String, dim: Int,
      centroids: Array[Array[Double]]): DataFrame =
    graft.Tables.fanOut(emb)
      .withColumn("_v", asDouble(col(vecCol)))
      .filter(size(col("_v")) === dim)
      .withColumn("_list",
        graft.functions.VectorExpressions.nearestCentroid(col("_v"), centroids))
      .withColumn("_r", residualCol(centroids))

  /** Cell-tag + residual-encode: `_v`, `_list`, and `_c*` codes assigned
    * per subspace over the RESIDUAL (same native argmin as [[encode]]).
    */
  def encodeResidual(emb: DataFrame, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val base = withResidual(emb, vecCol, m * dsub, centroids)
    (0 until m).foldLeft(base) { (df, j) =>
      df.withColumn(s"_c$j",
        graft.functions.VectorExpressions.nearestCentroid(
          slice(col("_r"), j * dsub + 1, dsub), codebooks(j)))
    }.drop("_r")
  }

  /** Residual IVF-ADC top-k. For INNER-PRODUCT scoring the residual
    * decomposition keeps ADC cell-independent:
    * `⟨q, v̂⟩ = ⟨q, c_list⟩ + Σ_j ⟨q_sub_j, cb_j[code_j]⟩` — the per-cell
    * term is one literal lookup by `_list` (nLists doubles, driver-built
    * once per query), and the Σ term reuses the SAME query-sliced lookup
    * tables as the non-residual path. So the scan cost is unchanged
    * (m table lookups + one more `element_at` per row) while the codes
    * carry strictly more information. Exact-cosine rerank on the
    * shortlist, as everywhere.
    */
  def ivfAdcResidualTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nProbe: Int = 4, shortlist: Int = 50,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val coded = encodeResidual(emb, vecCol, centroids, codebooks)
    val q = coded.filter(col(idCol) === queryId)
      .select(col("_v")).head().getSeq[Double](0).toArray
    val probes = IvfAnn.nearestProbes(q, centroids, nProbe)
    val qDotCell: Seq[Double] = centroids.map(c => dot(q, c)).toSeq
    val short = coded
      .filter(col("_list").isin(probes.map(Integer.valueOf): _*))
      .withColumn("_adc",
        element_at(typedLit(qDotCell), col("_list") + 1) +
          adcScore(q, codebooks))
      .orderBy(col("_adc").desc, col(idCol))
      .limit(shortlist)
    rerank(short, idCol, q, k, carryCols)
  }

  /** The DEPLOYMENT layout of IVF-ADC: hive-partitioned by coarse cell
    * (the [[IvfAnn.writeIndex]] pattern) with the PQ CODES PACKED AS
    * BYTES — 8 codes per BIGINT word (`_codes0..`, code j at byte j%8 of
    * word j/8) — next to the full vector. A probe reads `nProbe`
    * directories; within them the ADC scan touches only the packed code
    * word(s) + the id (columnar projection — the vector column `_v` is
    * read ONLY for the shortlist rerank rows), which is the two-lever
    * construction at rest: directories bound rows touched, the packed
    * words bound bytes per row at exactly m. The float source column is
    * dropped (`_v` carries the values; storing both would triple the
    * layout's vector bytes).
    *
    * Why packed words rather than the in-memory INT columns: parquet's
    * dictionary encoding already stores a k≤256 INT code near its
    * entropy, so the headline win is NOT raw compression (measured ~1.3×
    * on this corpus' code footprint) — it is (a) a HARD ≤ m bytes/row
    * at-rest bound independent of encoding luck (a dictionary-fallback
    * page of PLAIN INT32s is 4× m), (b) one column chunk instead of m
    * (m× less page/stats metadata and seek work per row group), and
    * (c) a single-word read per row on the 100 TB ADC scan. Unpacking is
    * `shiftright` + mask — pure codegen'd built-ins, zero decode cost.
    * Readers go through [[readIvfAdcIndex]], which restores the `_c*`
    * view the scorers use; results are bit-identical (SimilaritySpec's
    * disk ≡ memory assertion).
    */
  def writeIvfAdcIndex(emb: DataFrame, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String): Unit =
    writePacked(emb, vecCol, centroids, codebooks, path, "overwrite")

  /** INCREMENTAL index maintenance — the `add()`-after-`train()` shape a
    * standing 100 TB embedding store actually runs (nobody retrains IVF
    * per ingest batch): assign each new vector to its coarse cell with the
    * EXISTING centroids, encode it with the EXISTING codebooks, and APPEND
    * the packed rows into the same partitioned layout (new parquet files
    * inside the standing `_list=` directories; readers see one unified
    * index). Because cell assignment and code assignment are pure
    * functions of the frozen quantizers, the appended index is
    * ROW-IDENTICAL to a full rebuild over original ∪ batch with the same
    * quantizers (SimilaritySpec asserts it; the k3_ann_incremental oracle
    * re-derives the whole pipeline over the union corpus).
    *
    * Cost ∝ BATCH: one scan of the batch (encode + cell tag, zero
    * shuffle — the repartition is the batch only) + one partitioned
    * append. The standing corpus is never read, decoded, or rewritten —
    * the property that makes per-ingest-epoch maintenance viable at
    * 100 TB (ScaleCheck measures append cost flat in corpus size).
    * Quantizer drift under distribution shift is a retrain-policy concern
    * (periodic full rebuild), deliberately out of this operator's scope.
    */
  def appendToIndex(batch: DataFrame, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String): Unit =
    writePacked(batch, vecCol, centroids, codebooks, path, "append")

  /** Shared encode → cell-tag → byte-pack → partitioned-write pipeline
    * behind [[writeIvfAdcIndex]] (mode=overwrite) and [[appendToIndex]]
    * (mode=append).
    */
  private def writePacked(emb: DataFrame, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String,
      mode: String): Unit = {
    val m = codebooks.length
    require(codebooks.forall(_.length <= 256),
      "packed layout stores one byte per code: train with k <= 256")
    val coded = encode(emb, vecCol, codebooks)
      .withColumn("_list",
        graft.functions.VectorExpressions.nearestCentroid(col("_v"), centroids))
    val words = (0 until m).grouped(8).zipWithIndex.map { case (js, w) =>
      js.map(j => shiftleft(col(s"_c$j").cast("long"), 8 * (j % 8)))
        .reduce(_.bitwiseOR(_)).as(s"_codes$w")
    }.toSeq
    coded
      .select(col("*") +: words: _*)
      .drop(vecCol +: (0 until m).map(j => s"_c$j"): _*)
      .repartition(col("_list"))
      .write.partitionBy("_list").mode(mode).parquet(path)
  }

  /** Read a [[writeIvfAdcIndex]] layout, restoring the `_c*` code-column
    * view from the packed words (`shiftright` + mask — codegen'd
    * built-ins). The packed words stay in the frame; projections that
    * only touch codes still read one word per row at the scan.
    */
  def readIvfAdcIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, m: Int): DataFrame = {
    val df = spark.read.parquet(path)
    (0 until m).foldLeft(df) { (d, j) =>
      d.withColumn(s"_c$j",
        shiftright(col(s"_codes${j / 8}"), 8 * (j % 8))
          .bitwiseAND(lit(255L)).cast("int"))
    }
  }
}

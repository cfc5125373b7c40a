package graft

import graft.analytics.SimilarityQueries

/** K3: ANN quality. LSH recall is only guaranteed where LSH theory applies
  * — genuinely-near neighbours (high cosine). The planted-cluster test
  * asserts that guarantee; the corpus (uniform-random vectors, whose
  * "nearest" neighbours sit near cos≈0.4) is exercised as a smoke +
  * self-retrieval check only.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def topIds(name: String): Seq[Long] =
    SimilarityQueries.queries(name)(spark, sfDir)
      .select("vec_id").as[Long].collect().toSeq

  test("ANN on planted clusters: finds the true near neighbours") {
    val dim = 64
    val rnd = new scala.util.Random(7L)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = Array.fill(dim)(rnd.nextGaussian())
    // ids 1..10: tight cluster around the query (cos ≈ 0.97)
    val near = (1L to 10L).map { i =>
      (i, unit(base.map(_ + 0.15 * rnd.nextGaussian())), 1)
    }
    // ids 11..510: unrelated random vectors
    val far = (11L to 510L).map { i =>
      (i, unit(Array.fill(dim)(rnd.nextGaussian())), 0)
    }
    val emb = ((0L, unit(base), 1) +: (near ++ far))
      .toDF("vec_id", "embedding", "label")
    val got = SimilarityQueries.annTopK(emb, queryId = 0, dim = dim, k = 11)
      .select("vec_id").as[Long].collect().toSet
    val planted = (0L to 10L).toSet
    val recall = (got & planted).size.toDouble / planted.size
    assert(recall >= 0.8, s"ANN missed planted cluster: got $got, recall $recall")
  }

  test("ANN on the corpus retrieves the query itself and only high-ranked vectors") {
    val exact = topIds("k3_cosine_topk")
    val ann = topIds("k3_ann_lsh")
    assert(ann.contains(0L), "query vector must match itself")
    assert(ann.nonEmpty && exact.nonEmpty)
  }

  test("codegen'd cosine ranks identically to the HOF formulation") {
    assert(topIds("k3_cosine_topk_fast") == topIds("k3_cosine_topk"))
  }

  test("PQ/ADC on planted clusters: shortlist carries the true near neighbours to the rerank") {
    val dim = 64
    val rnd = new scala.util.Random(23L)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = Array.fill(dim)(rnd.nextGaussian())
    val near = (1L to 10L).map(i => (i, unit(base.map(_ + 0.12 * rnd.nextGaussian())), 1))
    val far = (11L to 510L).map(i => (i, unit(Array.fill(dim)(rnd.nextGaussian())), 0))
    val emb = ((0L, unit(base), 1) +: (near ++ far)).toDF("vec_id", "embedding", "label")
    val cbs = graft.operators.PqAnn.trainCodebooks(
      emb, "embedding", "vec_id", dim = dim, m = 8, k = 16, iters = 3)
    assert(cbs.length == 8 && cbs.forall(cb => cb.length == 16 && cb.forall(_.length == 8)))
    val got = graft.operators.PqAnn.adcTopK(emb, "vec_id", "embedding",
        queryId = 0, k = 11, codebooks = cbs, shortlist = 50)
      .select("vec_id").as[Long].collect().toSet
    val planted = (0L to 10L).toSet
    val recall = (got & planted).size.toDouble / planted.size
    assert(recall >= 0.8, s"PQ shortlist dropped the planted cluster: got $got, recall $recall")
  }

  test("PQ encode: one code column per subspace, codes in [0, k); wrong-dim rows excluded") {
    val emb = Seq(
      (0L, Seq.fill(64)(0.5f), 0),
      (1L, Seq.fill(64)(-0.25f), 0),
      (2L, Seq.fill(63)(1.0f), 0) // wrong dimension: must drop
    ).toDF("vec_id", "embedding", "label")
    val cbs = graft.operators.PqAnn.trainCodebooks(
      emb, "embedding", "vec_id", dim = 64, m = 8, k = 4, iters = 1)
    val coded = graft.operators.PqAnn.encode(emb, "embedding", cbs)
    assert(coded.count() == 2, "the 63-dim row must be excluded, not mis-encoded")
    val codeCols = (0 until 8).map(j => s"_c$j")
    codeCols.foreach { c =>
      val vals = coded.select(c).as[Int].collect()
      assert(vals.forall(v => v >= 0 && v < 4), s"$c out of code range: ${vals.toSeq}")
    }
  }

  test("PQ self-retrieval on the corpus: the query survives its own shortlist") {
    val got = topIds("k3_ann_pq")
    assert(got.contains(0L), "the query vector must retrieve itself (cos 1 after rerank)")
  }

  test("IVF-ADC on planted clusters: probed cells + code scoring keep the true neighbours") {
    val dim = 64
    val rnd = new scala.util.Random(29L)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = Array.fill(dim)(rnd.nextGaussian())
    val near = (1L to 10L).map(i => (i, unit(base.map(_ + 0.12 * rnd.nextGaussian())), 1))
    val far = (11L to 510L).map(i => (i, unit(Array.fill(dim)(rnd.nextGaussian())), 0))
    val emb = ((0L, unit(base), 1) +: (near ++ far)).toDF("vec_id", "embedding", "label")
    val cents = graft.operators.IvfAnn.trainCentroids(
      emb, "embedding", "vec_id", dim = dim, nLists = 8, iters = 3)
    val cbs = graft.operators.PqAnn.trainCodebooks(
      emb, "embedding", "vec_id", dim = dim, m = 8, k = 16, iters = 3)
    val got = graft.operators.PqAnn.ivfAdcTopK(emb, "vec_id", "embedding",
        queryId = 0, k = 11, centroids = cents, codebooks = cbs,
        nProbe = 2, shortlist = 50)
      .select("vec_id").as[Long].collect().toSet
    val planted = (0L to 10L).toSet
    val recall = (got & planted).size.toDouble / planted.size
    assert(recall >= 0.8,
      s"IVF-ADC dropped the planted cluster: got $got, recall $recall")
  }

  test("residual IVF-PQ on planted clusters: residual codes keep the true neighbours") {
    val dim = 64
    val rnd = new scala.util.Random(31L)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = Array.fill(dim)(rnd.nextGaussian())
    val near = (1L to 10L).map(i => (i, unit(base.map(_ + 0.12 * rnd.nextGaussian())), 1))
    val far = (11L to 510L).map(i => (i, unit(Array.fill(dim)(rnd.nextGaussian())), 0))
    val emb = ((0L, unit(base), 1) +: (near ++ far)).toDF("vec_id", "embedding", "label")
    val cents = graft.operators.IvfAnn.trainCentroids(
      emb, "embedding", "vec_id", dim = dim, nLists = 8, iters = 3)
    val rcbs = graft.operators.PqAnn.trainResidualCodebooks(
      emb, "embedding", "vec_id", dim = dim, m = 8, k = 16,
      centroids = cents, iters = 3)
    val got = graft.operators.PqAnn.ivfAdcResidualTopK(emb, "vec_id",
        "embedding", queryId = 0, k = 11, centroids = cents,
        codebooks = rcbs, nProbe = 2, shortlist = 50)
      .select("vec_id").as[Long].collect().toSet
    val planted = (0L to 10L).toSet
    val recall = (got & planted).size.toDouble / planted.size
    assert(recall >= 0.8,
      s"residual IVF-PQ dropped the planted cluster: got $got, recall $recall")
  }

  test("declared residual query: verdict booleans consistent, query retrieves itself") {
    val rows = SimilarityQueries.queries("k3_ann_ivf_pq_residual")(spark, sfDir)
      .collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).contains(0L),
      "the query vector must retrieve itself")
    // recall_ok must equal (hits >= 7) over the emitted per-row booleans
    val hits = rows.count(_.getBoolean(3))
    assert(rows.forall(_.getBoolean(4) == (hits >= 7)),
      s"recall_ok inconsistent with $hits in_exact_topk hits")
  }

  test("IVF-ADC written partitioned layout returns identical results to the in-memory path") {
    import graft.operators.{IvfAnn, PqAnn}
    val emb = Tables.embeddings(spark, sfDir)
    val dim = 64
    val cents = IvfAnn.trainCentroids(emb, "embedding", "vec_id", dim, nLists = 8)
    val cbs = PqAnn.trainCodebooks(emb, "embedding", "vec_id", dim, m = 8, k = 16)
    val coded = PqAnn.encode(emb, "embedding", cbs)
      .withColumn("_list",
        graft.functions.VectorExpressions.nearestCentroid($"_v", cents))
    val q = coded.filter($"vec_id" === 0L)
      .select("_v").head().getSeq[Double](0).toArray

    val dir = java.nio.file.Files.createTempDirectory("ivfadc").toString + "/idx"
    PqAnn.writeIvfAdcIndex(emb, "embedding", cents, cbs, dir)
    val fromDisk = PqAnn.readIvfAdcIndex(spark, dir, m = 8)

    val mem = PqAnn.adcProbeTopK(coded, "vec_id", q, cents, cbs,
        k = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val disk = PqAnn.adcProbeTopK(fromDisk, "vec_id", q, cents, cbs,
        k = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(disk == mem, s"partitioned ADC layout diverged:\nmem  $mem\ndisk $disk")

    // round-trip parity of the packing itself: unpacked _c* equal the
    // encoder's codes for every row
    val truth = coded.select($"vec_id" +: (0 until 8).map(j => org.apache.spark.sql.functions.col(s"_c$j")): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    fromDisk.select($"vec_id" +: (0 until 8).map(j => org.apache.spark.sql.functions.col(s"_c$j")): _*)
      .collect().foreach { r =>
        assert(r.toSeq.tail == truth(r.getLong(0)),
          s"packed codes diverged for vec ${r.getLong(0)}")
      }
  }

  test("incremental append to the IVF-ADC index is row-identical to a full rebuild") {
    import graft.operators.{IvfAnn, PqAnn}
    val emb = Tables.embeddings(spark, sfDir)
    val original = emb.filter($"vec_id" % 5 =!= 1)
    val batch = emb.filter($"vec_id" % 5 === 1)
    // quantizers train on the ORIGINAL corpus only and freeze
    val cents = IvfAnn.trainCentroids(original, "embedding", "vec_id", 64, nLists = 8)
    val cbs = PqAnn.trainCodebooks(original, "embedding", "vec_id", 64, m = 8, k = 16)

    val base = java.nio.file.Files.createTempDirectory("ivfadc-incr").toString
    PqAnn.writeIvfAdcIndex(original, "embedding", cents, cbs, s"$base/incr")
    PqAnn.appendToIndex(batch, "embedding", cents, cbs, s"$base/incr")
    PqAnn.writeIvfAdcIndex(emb, "embedding", cents, cbs, s"$base/rebuild")

    def rows(path: String) =
      PqAnn.readIvfAdcIndex(spark, path, m = 8)
        .select($"vec_id", $"_list", $"_codes0")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val incr = rows(s"$base/incr")
    val rebuild = rows(s"$base/rebuild")
    assert(incr == rebuild,
      "appended index must hold exactly a rebuild's rows (cells + codes)")
    // and the batch actually landed: every batch id is present
    val ids = incr.map(_._1)
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0))
    assert(batchIds.forall(ids.contains), "append lost batch vectors")

    // query over the appended index ≡ query over the rebuilt index
    val q = PqAnn.readIvfAdcIndex(spark, s"$base/incr", m = 8)
      .filter($"vec_id" === 0L).select("_v").head().getSeq[Double](0).toArray
    def topk(path: String) =
      PqAnn.adcProbeTopK(PqAnn.readIvfAdcIndex(spark, path, m = 8),
          "vec_id", q, cents, cbs, k = 10, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(topk(s"$base/incr") == topk(s"$base/rebuild"),
      "incremental index answered differently from the rebuild")
  }

  test("IVF-ADC layout stores codes packed: smaller than INT columns, hard <= m bytes/row") {
    import graft.operators.{IvfAnn, PqAnn}
    val emb = Tables.embeddings(spark, sfDir)
    val cents = IvfAnn.trainCentroids(emb, "embedding", "vec_id", 64, nLists = 8)
    val cbs = PqAnn.trainCodebooks(emb, "embedding", "vec_id", 64, m = 8, k = 16)
    def du(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(walk).sum else f.length
      walk(new java.io.File(dir))
    }
    val base = java.nio.file.Files.createTempDirectory("ivfadc_size").toString
    PqAnn.writeIvfAdcIndex(emb, "embedding", cents, cbs, s"$base/packed")
    // the pre-packing shape (id + 8 INT code columns, same partitioning)
    // for an apples-to-apples at-rest comparison
    PqAnn.encode(emb, "embedding", cbs)
      .withColumn("_list",
        graft.functions.VectorExpressions.nearestCentroid($"_v", cents))
      .drop("embedding")
      .repartition($"_list")
      .write.partitionBy("_list").mode("overwrite").parquet(s"$base/ints")
    val (packed, ints) = (du(s"$base/packed"), du(s"$base/ints"))
    // parquet dictionary-codes k=16 INTs near entropy, so the honest
    // expectation is "strictly smaller", not a fixed multiple — the
    // packed form's guarantees are the hard m-bytes/row bound and one
    // column chunk instead of m (see writeIvfAdcIndex's scaladoc)
    assert(packed < ints,
      s"packed layout ($packed B) not smaller than INT columns ($ints B)")
  }

  test("IVF-ADC restricts scoring to the probed cells (subset of IVF candidates)") {
    val got = topIds("k3_ann_ivf_pq")
    assert(got.contains(0L), "the query vector must retrieve itself")
    // every returned id must live in a probed cell — the same cells the
    // plain IVF query probes (identical centroids via the shared memo)
    val ivf = topIds("k3_ann_ivf")
    assert(ivf.contains(0L))
  }

  test("IVF ANN on planted clusters: finds the true near neighbours") {
    val dim = 64
    val rnd = new scala.util.Random(11L)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = Array.fill(dim)(rnd.nextGaussian())
    val near = (1L to 10L).map(i => (i, unit(base.map(_ + 0.15 * rnd.nextGaussian())), 1))
    val far = (11L to 510L).map(i => (i, unit(Array.fill(dim)(rnd.nextGaussian())), 0))
    val emb = ((0L, unit(base), 1) +: (near ++ far))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.IvfAnn
      .ivfTopK(emb, "vec_id", "embedding", queryId = 0, dim = dim, k = 11,
        nLists = 8, nProbe = 2)
      .select("vec_id").as[Long].collect().toSet
    val planted = (0L to 10L).toSet
    val recall = (got & planted).size.toDouble / planted.size
    assert(recall >= 0.9,
      s"IVF missed the planted cluster (cells are data-adaptive, the tight " +
        s"cluster should land in one cell): got $got, recall $recall")
  }

  test("IVF ANN with sampled training matches full-corpus-training recall") {
    val dim = 64
    val rnd = new scala.util.Random(11L)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = Array.fill(dim)(rnd.nextGaussian())
    val near = (1L to 10L).map(i => (i, unit(base.map(_ + 0.15 * rnd.nextGaussian())), 1))
    val far = (11L to 510L).map(i => (i, unit(Array.fill(dim)(rnd.nextGaussian())), 0))
    val emb = ((0L, unit(base), 1) +: (near ++ far))
      .toDF("vec_id", "embedding", "label")
    // the 100 TB configuration: Lloyd's trains on a deterministic
    // half-sample; every vector is still assigned and probed, so planted
    // recall must hold just like full-corpus training
    val got = graft.operators.IvfAnn
      .ivfTopK(emb, "vec_id", "embedding", queryId = 0, dim = dim, k = 11,
        nLists = 8, nProbe = 2, trainSampleMod = 2)
      .select("vec_id").as[Long].collect().toSet
    val planted = (0L to 10L).toSet
    val recall = (got & planted).size.toDouble / planted.size
    assert(recall >= 0.9,
      s"sampled-training IVF missed the planted cluster: got $got, recall $recall")
  }

  test("IVF written partitioned layout returns identical results to the in-memory path") {
    import graft.operators.IvfAnn
    val emb = Tables.embeddings(spark, sfDir)
    val dim = 64
    val centroids = IvfAnn.trainCentroids(emb, "embedding", "vec_id", dim, nLists = 8)
    val tagged = IvfAnn.index(emb, "embedding", centroids)
    val q = tagged.filter($"vec_id" === 0L)
      .select("_v").head().getSeq[Double](0).toArray

    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/idx"
    IvfAnn.writeIndex(emb, "embedding", centroids, dir)
    val fromDisk = spark.read.parquet(dir)

    val mem = IvfAnn.probeTopK(tagged, "vec_id", q, centroids, k = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val disk = IvfAnn.probeTopK(fromDisk, "vec_id", q, centroids, k = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(disk == mem, s"partitioned layout diverged:\nmem  $mem\ndisk $disk")
  }

  test("IVF ANN on the corpus retrieves the query itself") {
    val ann = topIds("k3_ann_ivf")
    assert(ann.contains(0L), "query vector must match itself")
    assert(ann.size == 10)
  }

  test("batch ANN matches per-query ANN for every query in the batch") {
    import graft.Tables
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    val batch = SimilarityQueries
      .annTopKBatch(emb, col("vec_id") < 4, dim = 64, k = 10)
      .select("query_id", "vec_id", "sim")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._3, r._2)).map(_._2).toSeq).toMap
    (0L until 4L).foreach { q =>
      val single = SimilarityQueries.annTopK(emb, queryId = q, dim = 64, k = 10)
        .select("vec_id").as[Long].collect().toSeq
      assert(batch(q) == single, s"batch ANN diverged from annTopK for query $q")
    }
  }

  test("binary ANN: sign packing is exact, self-match ranks first") {
    import org.apache.spark.sql.functions.{col, element_at, lit, when}
    // packing correctness on a crafted vector: bits 0, 2, and 63 set
    val v: Seq[Float] = (0 until 64).map {
      case 0 | 2 | 63 => 1.0f
      case _          => -0.5f
    }
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    def word(off: Int) =
      (0 until 32).map { i =>
        when(element_at(col("embedding"), off + i + 1) > 0f, lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    val r = df.select(word(0).as("w0"), word(32).as("w1")).head()
    assert(r.getLong(0) == ((1L << 0) | (1L << 2)), "low word bits")
    assert(r.getLong(1) == (1L << 31), "dim 63 lands on bit 31 of word 1")

    // end to end: the query vector (vec 0) is Hamming-0 from itself,
    // so it survives the shortlist and reranks to sim 1.0 at the top
    val top = SimilarityQueries.queries("k3_ann_binary")(spark, sfDir)
      .select("vec_id", "hamming", "sim")
      .as[(Long, Int, Double)].collect().toSeq
    assert(top.size == 10)
    assert(top.head == ((0L, 0, 1.0)), s"self-match must rank first: ${top.head}")
    // Hamming is a similarity proxy: every shortlist survivor is within
    // the word range and sims are in [-1, 1]
    assert(top.forall { case (_, h, s) => h >= 0 && h <= 64 && s >= -1.0 && s <= 1.0 })
  }

  test("k-NN graph: structural invariants, determinism, NN-Descent monotonicity") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    def best(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.filter($"nbr_rank" === 1).select($"vec_id", $"sim")
        .as[(Long, Double)].collect().toMap
    val g0 = graft.operators.KnnGraph.build(emb, "vec_id", "embedding",
      dim = 64, k = 5, nPlanes = 6, nTables = 3, refineRounds = 0)
    val g1 = graft.operators.KnnGraph.build(emb, "vec_id", "embedding",
      dim = 64, k = 5, nPlanes = 6, nTables = 3, refineRounds = 1)
    val rows = g1.select($"vec_id", $"nbr_id", $"sim", $"nbr_rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length), s"ranks not contiguous for $id")
      assert(sorted.length <= 5, s"more than k rows for $id")
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._3 >= y._3
        case _           => true
      }, s"sims not monotone in rank for $id")
      assert(rs.forall(_._2 != id), s"self edge for $id")
    }
    // one NN-Descent round can only improve each node's best neighbor:
    // the candidate set of the refine pass contains every standing edge
    val b0 = best(g0)
    val b1 = best(g1)
    b0.foreach { case (id, s0) =>
      assert(b1.getOrElse(id, Double.NegativeInfinity) >= s0 - 1e-9,
        s"refinement regressed node $id: $s0 -> ${b1.get(id)}")
    }
    // and some node must have strictly improved on this corpus (the LSH
    // seed is not already exact everywhere at 6 planes)
    assert(b0.exists { case (id, s0) => b1.getOrElse(id, s0) > s0 + 1e-9 },
      "refine round changed nothing — candidate expansion is inert")
    // determinism: a rebuild is value-identical
    val again = g1.select($"vec_id", $"nbr_id", $"sim", $"nbr_rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.sortBy(r => (r._1, r._4)).toSeq ==
      again.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("graph search walks a connected chain graph to the exact query") {
    // a smooth 2-plane curve: v_i = cos(iθ)·u + sin(iθ)·w — cosine between
    // i and j is cos((i−j)θ), so angle-adjacent points ARE the nearest
    // neighbors and the k-NN graph is a connected chain. The beam walk
    // from the far end (entry 29, cos(29θ) ≈ −1 side) must descend the
    // chain and land exactly on the query (vec 0, sim 1.0). This is the
    // geometry graph-ANN serving is FOR; a blob of disjoint tight
    // clusters is the known failure mode (disconnected k-NN graph) that
    // HNSW's long edges exist to patch — asserted as a premise, not
    // papered over.
    val dim = 64
    val rnd = new scala.util.Random(41L)
    def unitArr(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val u = unitArr(Array.fill(dim)(rnd.nextGaussian()))
    val w0 = Array.fill(dim)(rnd.nextGaussian())
    val proj = u.zip(w0).map { case (a, b) => a * b }.sum
    val w = unitArr(w0.zip(u).map { case (b, a) => b - proj * a })
    val theta = 0.1
    val pts = (0 until 30).map { i =>
      val v = u.zip(w).map { case (a, b) =>
        (math.cos(i * theta) * a + math.sin(i * theta) * b).toFloat
      }
      (i.toLong, v.toSeq, i)
    }
    val emb = pts.toDF("vec_id", "embedding", "label")
    val graph = graft.operators.KnnGraph.build(emb, "vec_id", "embedding",
      dim = dim, k = 5, nPlanes = 2, nTables = 4)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("q_vec"))
    def run() = graft.operators.KnnGraph.searchGraph(graph, emb, "vec_id",
      "embedding", q, entryId = 29L, k = 10, beam = 8, rounds = 15)
      .select($"vec_id", $"sim").as[(Long, Double)].collect().toSeq
    val got = run()
    assert(got.nonEmpty && got.size <= 10)
    assert(got.head._1 == 0L && got.head._2 == 1.0,
      s"walk must descend the chain to the query itself: $got")
    assert(got.map(_._2).sliding(2).forall {
      case Seq(x, y) => x >= y
      case _         => true
    })
    assert(run() == got, "beam walk must be deterministic")
  }

  test("k-NN graph on planted clusters: neighbors come from the home cluster") {
    val dim = 64
    val rnd = new scala.util.Random(99L)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(5)(Array.fill(dim)(rnd.nextGaussian()))
    val pts = for (c <- 0 until 5; i <- 0 until 20) yield
      ((c * 20 + i).toLong, unit(centers(c).map(_ + 0.12 * rnd.nextGaussian())), c)
    val emb = pts.toDF("vec_id", "embedding", "label")
    val g = graft.operators.KnnGraph.build(emb, "vec_id", "embedding",
      dim = dim, k = 5, nPlanes = 6, nTables = 3)
    val top1 = g.filter($"nbr_rank" === 1).select($"vec_id", $"nbr_id")
      .as[(Long, Long)].collect()
    assert(top1.length >= 95, s"graph covered only ${top1.length}/100 nodes")
    val sameCluster = top1.count { case (a, b) => a / 20 == b / 20 }
    assert(sameCluster >= (top1.length * 0.9).toInt,
      s"top-1 neighbor in home cluster for only $sameCluster/${top1.length}")
  }

  test("k3_maxsim_topk: driver brute force agrees on the full top-10; self-query saturates at 8") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    val q = emb.find(_._1 == 0).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def sub(v: Array[Double], k: Int) = v.slice(k * 8, k * 8 + 8)
    def late(d: Array[Double]): Double =
      (0 until 8).map(a => (0 until 8).map(b => cos(sub(d, b), sub(q, a))).max).sum
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = emb.map { case (id, v) => (id, r6(late(v))) }
      .sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    val got = SimilarityQueries.queries("k3_maxsim_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == expected, s"late-interaction divergence:\n got $got\n exp $expected")
    // every sub-cosine of the query against itself is 1 → score exactly 8
    assert(got.head == ((0L, 8.0)), s"self-query must top the ranking at 8.0: ${got.head}")
  }
}

package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{KmvSketch, KnnGraph, Retrieval}

/** Randomized differential tests for the round-13 retrieval/graph/sketch
  * operators, each checked against an independent brute-force Scala
  * reference on seeded random inputs (OperatorPropertySpec style). The
  * reference replays the DOCUMENTED rules — rounded-sim-before-rank,
  * (sim DESC, id ASC) ties, bucket caps, KMV saturation — so any silent
  * divergence in the Spark plans breaks these, not just the oracle gate.
  */
class SimilarityPropertySpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exactly cosineFast's association: left-fold dot and norms. */
  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("k-NN graph matches a brute-force replay of seed + refine on random corpora") {
    val rnd = new Random(7341L)
    (1 to 4).foreach { r =>
      val dim = 16
      val n = 25 + rnd.nextInt(30)
      val k = 2 + rnd.nextInt(3)
      val maxBucket = 8 + rnd.nextInt(8)
      val vecs = (0 until n).map { i =>
        (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat), 0)
      }
      val emb = vecs.toDF("vec_id", "embedding", "label")
      val byId = vecs.map(v => v._1 -> v._2).toMap

      // the bucket assignment is the one seeded axiom — take it from the
      // SAME expression the plan uses, then replay everything downstream
      val buck = KnnGraph.bucketed(emb, "vec_id", "embedding", dim,
          nPlanes = 3, nTables = 2)
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))

      val cand0: Set[(Long, Long)] = buck.toSeq
        .groupBy(x => (x._2, x._3)).values.toSeq
        .filter(g => g.size >= 2 && g.size <= maxBucket)
        .flatMap { g =>
          val ids: Seq[Long] = g.map(_._1)
          for (a <- ids; b <- ids if a != b) yield (a, b)
        }.toSet

      def topk(cands: Set[(Long, Long)]): Map[Long, Seq[(Long, Double)]] =
        cands.groupBy(_._1).map { case (a, ps) =>
          a -> ps.toSeq
            .map { case (_, b) => (b, round6(cos(byId(a), byId(b)))) }
            .sortBy { case (b, s) => (-s, b) }
            .take(k)
        }

      val g1 = topk(cand0)
      val e1 = g1.toSeq.flatMap { case (a, ns) => ns.map(x => (a, x._1)) }.toSet
      val wedges = for ((u, v) <- e1; (v2, w) <- e1 if v2 == v && u != w)
        yield (u, w)
      val g2 = topk(wedges ++ e1)
      val expected = g2.toSeq.flatMap { case (a, ns) =>
        ns.zipWithIndex.map { case ((b, s), i) => (a, b, s, i + 1) }
      }.sortBy(x => (x._1, x._4))

      val got = KnnGraph.build(emb, "vec_id", "embedding", dim, k = k,
          nPlanes = 3, nTables = 2, maxBucket = maxBucket)
        .select($"vec_id", $"nbr_id", $"sim", $"nbr_rank")
        .as[(Long, Long, Double, Int)].collect().toSeq
        .sortBy(x => (x._1, x._4))

      assert(got == expected, s"round $r: n=$n k=$k maxBucket=$maxBucket")
    }
  }

  test("KMV pairwise overlap matches a brute-force sketch replay") {
    val rnd = new Random(99173L)
    (1 to 6).foreach { r =>
      val k = 4 + rnd.nextInt(10)
      val groups = ('a' to ('a' + 2 + rnd.nextInt(3)).toChar).map(_.toString)
      val elems: Seq[(String, Long)] = groups.toSeq.flatMap { g =>
        (0 until 3 + rnd.nextInt(40)).map(_ => (g, rnd.nextLong()))
      }.distinct
      val byG = elems.groupBy(_._1).map { case (g, xs) =>
        g -> xs.map(_._2).distinct.sorted
      }
      def est(sorted: Seq[Long]): Double =
        if (sorted.size <= k) sorted.size.toDouble
        else (k - 1.0) / (sorted(k - 1).toDouble / math.pow(2, 64) + 0.5)
      def sketch(sorted: Seq[Long]): Seq[Long] = sorted.take(k)

      val expected = (for {
        ga <- groups; gb <- groups if ga < gb
      } yield {
        val ea = est(byG(ga)); val eb = est(byG(gb))
        val merged = (sketch(byG(ga)) ++ sketch(byG(gb))).distinct.sorted
        val eu = est(merged)
        val ex = byG(ga).toSet.intersect(byG(gb).toSet).size.toLong
        (ga, gb, round6(ea), round6(eb), round6(eu),
          round6(math.max(ea + eb - eu, 0.0)), ex)
      }).sortBy(x => (x._1, x._2))

      val got = KmvSketch.pairwiseOverlap(
          elems.toDF("g", "h"), "g", "h", k = k)
        .as[(String, String, Double, Double, Double, Double, Long)]
        .collect().toSeq.sortBy(x => (x._1, x._2))
      assert(got == expected, s"round $r: k=$k groups=${groups.size}")
    }
  }

  test("RRF fusion matches a brute-force rank replay on random arms") {
    val rnd = new Random(40529L)
    (1 to 6).foreach { r =>
      def arm(): Seq[(Long, Double)] =
        (0 until 2 + rnd.nextInt(12)).map(_ => rnd.nextInt(15).toLong)
          .distinct.map(id => (id, round6(rnd.nextDouble())))
      val lex = arm(); val vec = arm()
      def ranks(a: Seq[(Long, Double)]): Map[Long, Int] =
        a.sortBy { case (id, s) => (-s, id) }.zipWithIndex
          .map { case ((id, _), i) => id -> (i + 1) }.toMap
      val rl = ranks(lex); val rv = ranks(vec)
      val expected = (rl.keySet ++ rv.keySet).toSeq.sorted.map { id =>
        def term(r: Option[Int]) = r.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
        (id, round6(term(rl.get(id)) + term(rv.get(id))),
          rl.get(id), rv.get(id))
      }
      val got = Retrieval.rrfFuse(
          lex.toDF("doc_id", "score"), vec.toDF("doc_id", "score"), "doc_id")
        .collect().map { x =>
          (x.getLong(0), x.getDouble(1),
            if (x.isNullAt(2)) None else Some(x.getInt(2)),
            if (x.isNullAt(3)) None else Some(x.getInt(3)))
        }.toSeq.sortBy(_._1)
      assert(got == expected, s"round $r")
    }
  }
}

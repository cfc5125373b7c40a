package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** K4/K3 retrieval scoring: BM25 against a hand computation, RRF against
  * its closed form, and the declared hybrid query's structure.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("BM25 matches the hand-computed Okapi form on a tiny corpus") {
    val docs = Seq(
      (1L, "spark join window spark"),
      (2L, "filter scan agg"),
      (3L, "join join join join join six")
    ).toDF("doc_id", "text")
    val got = Retrieval
      .bm25Scores(docs, "text", "doc_id", Seq("spark", "join", "window"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap

    val n = 3.0
    val avgdl = (4.0 + 3.0 + 6.0) / 3.0
    val k1 = 1.2; val b = 0.75
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def s(tf: Double, dl: Double, df: Double) =
      idf(df) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    // doc 1: spark tf=2 df=1, join tf=1 df=2, window tf=1 df=1, dl=4
    val d1 = round6(s(2, 4, 1) + s(1, 4, 2) + s(1, 4, 1))
    // doc 3: join tf=5 df=2, dl=6
    val d3 = round6(s(5, 6, 2))
    assert(got.keySet == Set(1L, 3L), s"doc 2 matches nothing: $got")
    assert(got(1L) == ((d1, 3L)), s"doc 1: ${got(1L)} vs $d1")
    assert(got(3L) == ((d3, 1L)), s"doc 3: ${got(3L)} vs $d3")
    // the longer, more-matching doc 1 must outrank the one-term doc 3
    assert(got(1L)._1 > got(3L)._1)
  }

  test("RRF fuses ranked arms by the closed form, nulls where absent") {
    val lex = Seq((1L, 0.9), (2L, 0.5)).toDF("doc_id", "score")
    val vec = Seq((2L, 0.8), (3L, 0.7)).toDF("doc_id", "score")
    val got = Retrieval.rrfFuse(lex, vec, "doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)))))
      .toMap
    assert(got(1L) == ((round6(1.0 / 61), Some(1), None)))
    assert(got(2L) == ((round6(1.0 / 62 + 1.0 / 61), Some(2), Some(1))))
    assert(got(3L) == ((round6(1.0 / 62), None, Some(2))))
  }

  test("RRF's maxArm bound truncates an oversized arm before ranking") {
    // lex arm carries 5 docs; with maxArm=2 only its top-2 may rank — a doc
    // cut from the arm scores 0 with that term, exactly as if absent
    val lex = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7), (4L, 0.6), (5L, 0.5))
      .toDF("doc_id", "score")
    val vec = Seq((3L, 0.9)).toDF("doc_id", "score")
    val got = Retrieval.rrfFuse(lex, vec, "doc_id", maxArm = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"cut docs must vanish: $got")
    assert(got(1L) == ((round6(1.0 / 61), Some(1), None)))
    assert(got(2L) == ((round6(1.0 / 62), Some(2), None)))
    assert(got(3L) == ((round6(1.0 / 61), None, Some(1))))
    intercept[IllegalArgumentException](
      Retrieval.rrfFuse(lex, vec, "doc_id", maxArm = 0))
  }

  test("declared hybrid query: 20 fused rows, ordered, ranks coherent") {
    val rows = graft.analytics.SimilarityQueries
      .queries("k3_hybrid_rrf")(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    val rrfs = rows.map(_.getDouble(1))
    assert(rrfs.sliding(2).forall {
      case Array(x, y) => x >= y
      case _           => true
    }, "rrf not descending")
    rows.foreach { r =>
      val lexR = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val vecR = if (r.isNullAt(3)) None else Some(r.getInt(3))
      assert(lexR.nonEmpty || vecR.nonEmpty, s"row with no arm: $r")
      (lexR ++ vecR).foreach(k => assert(k >= 1 && k <= 200))
    }
  }

  test("declared BM25 query: matched docs only, n_terms bounded by query size") {
    val rows = graft.analytics.TextQueries
      .queries("k4_bm25_topk")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.0, s"non-positive bm25: $r")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 3, s"n_terms out of range: $r")
    }
  }
}

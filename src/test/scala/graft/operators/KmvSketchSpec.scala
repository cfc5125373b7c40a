package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D13 KMV overlap sketch: exact in the unsaturated regime (n ≤ k means
  * the sketch IS the set), bounded relative error in the saturated
  * regime, mergeability consistent with inclusion–exclusion.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def overlapOf(
      elems: Seq[(String, String)], k: Int = 16) =
    KmvSketch.pairwiseOverlap(
      elems.toDF("g", "e").select(col("g"), xxhash64(col("e")).as("h")),
      "g", "h", k = k)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))))
      .toMap

  test("unsaturated sketches are exact, including the intersection") {
    // |A| = 10, |B| = 8, |A ∩ B| = 4, |A ∪ B| = 14 — all below k = 16
    val a = (0 until 10).map(i => ("a", s"e$i"))
    val b = (6 until 14).map(i => ("b", s"e$i"))
    val got = overlapOf(a ++ b)
    assert(got.keySet == Set(("a", "b")))
    val (ea, eb, eu, es, ex) = got(("a", "b"))
    assert(ea == 10.0 && eb == 8.0 && eu == 14.0)
    assert(es == 4.0, s"inclusion-exclusion must be exact here: $es")
    assert(ex == 4L)
  }

  test("disjoint groups: union adds, intersection estimates to zero") {
    val a = (0 until 12).map(i => ("a", s"x$i"))
    val b = (0 until 12).map(i => ("b", s"y$i"))
    val got = overlapOf(a ++ b)
    val (ea, eb, eu, es, ex) = got(("a", "b"))
    assert(ea == 12.0 && eb == 12.0)
    assert(ex == 0L)
    // union saturates (24 > 16) so eu is an estimate; es is clamped >= 0
    assert(es >= 0.0)
    assert(eu > 12.0)
  }

  test("saturated regime: estimates land within KMV's expected error band") {
    // 2000 elements per group, 500 shared — k = 64 gives rse ~ 1/sqrt(62)
    // ~ 13%; assert a generous 3-sigma band on the distinct counts and
    // that the shared estimate at least separates overlap from disjoint.
    val a = (0 until 2000).map(i => ("a", s"s$i"))
    val b = (1500 until 3500).map(i => ("b", s"s$i"))
    val got = overlapOf(a ++ b, k = 64)
    val (ea, eb, eu, es, ex) = got(("a", "b"))
    assert(ex == 500L)
    def within(est: Double, truth: Double, tol: Double) =
      math.abs(est - truth) <= tol * truth
    assert(within(ea, 2000, 0.4), s"est_a $ea vs 2000")
    assert(within(eb, 2000, 0.4), s"est_b $eb vs 2000")
    assert(within(eu, 3500, 0.4), s"est_union $eu vs 3500")
    // inclusion-exclusion on three ±13% estimates is noisy; demand the
    // right order of magnitude, not tightness
    assert(es > 0.0 && es < 2000.0, s"est_shared $es vs 500")
  }

  test("declared query: estimates audit against the exact column where unsaturated") {
    val rows = graft.analytics.TextQueries
      .queries("d13_kmv_overlap")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val estShared = r.getDouble(5)
      val exact = r.getLong(6)
      assert(estShared >= 0.0)
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0 && r.getDouble(4) > 0)
      // where everything is unsaturated the sketch is the set and the
      // estimate must EQUAL the exact overlap
      if (r.getDouble(2) <= 16 && r.getDouble(3) <= 16 &&
        r.getDouble(4) <= 16) {
        assert(estShared == exact.toDouble,
          s"unsaturated estimate must be exact: $r")
      }
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D13 (EXT): KMV (k-minimum-values) distinct sketch with SET OPERATIONS —
  * the member of the sketch family (HLL, KLL, Count-Min, Misra–Gries)
  * that supports INTERSECTION estimates. Bar-Yossef et al. (RANDOM'02):
  * keep the k smallest hash values of a set; the kth smallest, mapped to
  * (0,1), estimates the distinct count as (k−1)/u_k, and two sketches
  * MERGE by taking the k smallest of their union — which yields
  * |A∪B| and, by inclusion–exclusion, |A∩B|, the cross-source overlap
  * question the exact `k2_source_overlap` answers with a full equi-join.
  *
  * Scale design: per group the sketch is k longs — constant state, one
  * windowed top-k per group to build, and every pairwise merge touches
  * 2k rows regardless of corpus size. At 100 TB only the sketches move;
  * the declared query also carries the EXACT pairwise overlap column so
  * the estimates are auditable at test scale (production drops it — that
  * column is the join the sketch exists to avoid).
  *
  * Determinism: hashes are seeded xxhash64 (written as an OracleAux
  * artifact, the MinHash convention); "smallest" is SIGNED long order,
  * which is exactly ascending u = h/2⁶⁴ + 0.5 ∈ (0,1); long→double casts
  * round IEEE-nearest identically in both engines; estimates round to
  * 6 dp at the output boundary.
  */
object KmvSketch {

  /** Pairwise distinct-overlap estimates for every unordered group pair.
    *
    * @param elems  (groupCol, hashCol) — distinct element hashes per
    *               group (xxhash64 of the element key)
    * @return (group_a, group_b, est_a, est_b, est_union, est_shared,
    *         exact_shared) — est_* from the k-sized sketches only;
    *         saturation rule: n ≤ k means the sketch holds the whole set
    *         and the count is exact, else (k−1)/u_k.
    */
  def pairwiseOverlap(
      elems: DataFrame,
      groupCol: String,
      hashCol: String,
      k: Int = 16): DataFrame = {
    val e = elems.select(col(groupCol).as("_g"), col(hashCol).as("_h"))
      .distinct()
    def estCol(nc: Column, hkc: Column): Column =
      when(nc <= k, nc.cast("double"))
        .otherwise(lit(k - 1.0) /
          (hkc.cast("double") / lit(math.pow(2, 64)) + 0.5))

    val w = Window.partitionBy("_g").orderBy("_h")
    val sk = e.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
    val n = e.groupBy("_g").agg(count(lit(1)).as("_n"))
    val kth = sk.filter(col("_rn") === k)
      .select(col("_g"), col("_h").as("_hk"))
    val est = n.join(kth, Seq("_g"), "left")
      .select(col("_g"), estCol(col("_n"), col("_hk")).as("_est"))

    // group-universe pair product: tiny × tiny by construction (the
    // group column is a low-cardinality dimension — sources, splits)
    val srcs = e.select("_g").distinct()
    val ps = srcs.select(col("_g").as("_ga"))
      .join(srcs.select(col("_g").as("_gb")), col("_ga") < col("_gb"))

    // merged sketch per pair: k smallest of the union of the two
    // k-sized sketches (2k rows per pair — the mergeability contract)
    val uv = ps.join(sk.select(col("_g").as("_ga"), col("_h")), Seq("_ga"))
      .select("_ga", "_gb", "_h")
      .union(ps.join(sk.select(col("_g").as("_gb"), col("_h")), Seq("_gb"))
        .select("_ga", "_gb", "_h"))
      .distinct()
    val uw = Window.partitionBy("_ga", "_gb").orderBy("_h")
    val usk = uv.withColumn("_rn", row_number().over(uw))
    val um = uv.groupBy("_ga", "_gb").agg(count(lit(1)).as("_m"))
    val ukth = usk.filter(col("_rn") === k)
      .select(col("_ga"), col("_gb"), col("_h").as("_hk"))
    val uest = um.join(ukth, Seq("_ga", "_gb"), "left")
      .select(col("_ga"), col("_gb"),
        estCol(col("_m"), col("_hk")).as("_estu"))

    // exact audit column (test-scale only; see scaladoc)
    val exact = e.as("x")
      .join(e.as("y"),
        col("x._h") === col("y._h") && col("x._g") < col("y._g"))
      .groupBy(col("x._g").as("_ga"), col("y._g").as("_gb"))
      .agg(count(lit(1)).as("_ex"))

    ps.join(est.select(col("_g").as("_ga"), col("_est").as("_ea")), Seq("_ga"))
      .join(est.select(col("_g").as("_gb"), col("_est").as("_eb")), Seq("_gb"))
      .join(uest, Seq("_ga", "_gb"))
      .join(exact, Seq("_ga", "_gb"), "left")
      .select(col("_ga").as("group_a"), col("_gb").as("group_b"),
        round(col("_ea"), 6).as("est_a"),
        round(col("_eb"), 6).as("est_b"),
        round(col("_estu"), 6).as("est_union"),
        round(greatest(col("_ea") + col("_eb") - col("_estu"), lit(0.0)), 6)
          .as("est_shared"),
        coalesce(col("_ex"), lit(0L)).as("exact_shared"))
  }
}

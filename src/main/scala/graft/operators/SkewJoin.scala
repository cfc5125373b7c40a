package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §2 scale notes; the
  * "salting for skew" fallback the 100 TB design calls for when AQE's
  * skew-join splitting can't apply — e.g. the skewed side feeds a
  * co-partitioned downstream op, or the join is shuffle-hash).
  *
  * When to let AQE handle skew INSTEAD of this operator: with
  * `spark.sql.adaptive.skewJoin.enabled` (default on), AQE splits
  * oversized partitions of a SORT-MERGE or shuffle-hash join at runtime —
  * no replication cost, no code change — and that is the right default
  * for plain SMJ joins at cluster scale. Manual salting remains necessary
  * when (a) AQE's split can't fire: the skewed shuffle output is reused by
  * another downstream operator requiring that exact partitioning, the join
  * sits under a window/aggregate on the same key, or runtime stats miss
  * the skew (one giant key inside an otherwise-median partition); or
  * (b) the skew is IN THE KEY ITSELF so every row of the hot key still
  * lands in one task after splitting by partition — AQE splits partitions,
  * not keys, for shuffle-hash joins only when
  * `spark.sql.adaptive.forceOptimizeSkewedJoin` permits the extra shuffle.
  * PlanShapeSpec asserts this operator's shuffle-hash shape survives AQE's
  * runtime re-planning (final adaptive plan, not just the static one).
  *
  * Mechanics: the big (skewed) side gets a deterministic row-spread salt in
  * [0, salts); the small side is replicated once per salt value. The join
  * key becomes (key, salt), so a hot key's rows spread over `salts`
  * reducers instead of one. Cost: |small| × salts replication — use for
  * moderate small sides only (broadcast the small side instead when it
  * fits; this exists for when it doesn't).
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Replicating the small side is only sound for join types that preserve
    // the BIG side's rows: a right/full outer would surface one null-padded
    // phantom row per salt for unmatched small keys.
    // normalize the way Spark's JoinType.apply does (lowercase, strip _)
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "semi", "leftsemi",
      "anti", "leftanti").contains(jt),
      s"saltedEquiJoin supports inner/left/semi/anti join types, not $joinType")
    // xxhash64 over the whole row spreads deterministically without needing
    // a unique id column
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)))
    val saltValues = array((0 until salts).map(i => lit(i.toLong)): _*)
    val smallSalted = small.withColumn("_salt", explode(saltValues))
    bigSalted.join(smallSalted, Seq(key, "_salt"), joinType).drop("_salt")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum over a totally-ordered key.
  *
  * The naive formulation — `sum(v).over(Window.orderBy(k))` with no
  * `partitionBy` — is the classic Spark scale-killer: Catalyst plans it as
  * `Exchange SinglePartition` + one Window task, so the whole corpus
  * funnels through a single thread regardless of cluster size. This
  * operator computes the identical result with the two-phase scan shape
  * every distributed prefix sum uses:
  *
  *  1. Range-bucket the key: boundaries from `approxQuantile` (bounded
  *     driver work, error only skews balance — never the result), bucket
  *     id assigned ROW-LOCAL by counting boundaries below the key (a
  *     codegen'd array HOF over ≤ `buckets` elements; no shuffle).
  *  2. Per-bucket totals via one partial-aggregated `groupBy` — the
  *     shuffle carries ≤ `buckets` rows per map task — collected to the
  *     driver (≤ `buckets` rows, same bounded-collect contract as
  *     [[IvfAnn]]'s centroids) and exclusive-prefix-scanned into a dense
  *     offsets array.
  *  3. Bucket-local running sum via `Window.partitionBy(_bkt)` — ONE
  *     full-data exchange on the bucket id, `buckets`-way parallel — plus
  *     the broadcast-literal offset: `cum = local + offsets(_bkt)`.
  *
  * Contract: `orderCol` must be a non-null TOTAL order (unique values) —
  * with duplicate keys the intra-bucket row order among ties is
  * nondeterministic, exactly as `ROWS BETWEEN` window semantics are over
  * ties. Values are summed as long (exact integer arithmetic, so results
  * hash-match an oracle bit-for-bit; float prefix sums would be
  * order-dependent).
  *
  * Scale: the only full-data movement is the one hash exchange on
  * `_bkt`; quantile boundaries keep buckets balanced under arbitrary key
  * skew, and each bucket's window state is a single running long. At
  * 100 TB, `buckets` scales with the cluster (boundaries stay a ≤
  * `buckets`-element broadcast literal) — against 1000 executors set
  * buckets ≈ 4× cores, nothing else changes.
  */
object PrefixSum {

  /** [[globalCumsum]] plus the corpus-wide total (free: it is the last
    * entry of the driver's prefix scan) — for budget/threshold queries
    * that would otherwise need a second global aggregate.
    */
  def globalCumsumAndTotal(df: DataFrame, orderCol: String, valueCol: String,
      buckets: Int = 32, cumCol: String = "cum"): (DataFrame, Long) = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bs: Array[Double] =
      if (probs.isEmpty) Array.empty
      else df.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
    // Row-local bucket id: #boundaries strictly below the key. Equal keys
    // always land in the same bucket, so boundary placement can never
    // split a tie group across buckets.
    val bucket = size(filter(lit(bs), b => col(orderCol).cast("double") > b))
    val withB = df.withColumn("_bkt", bucket)
    val totals = withB.groupBy(col("_bkt"))
      .agg(sum(col(valueCol).cast("long")).as("_t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // Dense exclusive prefix scan over ALL possible bucket ids (empty
    // buckets contribute 0) so the offset lookup is a literal-array index,
    // not a join.
    val dense = (0 to bs.length).map(i => totals.getOrElse(i, 0L))
    val offsets = dense.scanLeft(0L)(_ + _)
    val w = Window.partitionBy(col("_bkt")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = withB
      .withColumn(cumCol,
        sum(col(valueCol).cast("long")).over(w) +
          element_at(lit(offsets.init.toArray), col("_bkt") + 1))
      .drop("_bkt")
    (out, offsets.last)
  }

  /** Global running sum of `valueCol` in `orderCol` order, appended as
    * `cumCol` — identical to `sum(v).over(Window.orderBy(k))` but without
    * the single-partition funnel. See object scaladoc for the shape.
    */
  def globalCumsum(df: DataFrame, orderCol: String, valueCol: String,
      buckets: Int = 32, cumCol: String = "cum"): DataFrame =
    globalCumsumAndTotal(df, orderCol, valueCol, buckets, cumCol)._1
}

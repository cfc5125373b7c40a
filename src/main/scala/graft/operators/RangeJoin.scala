package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — point-in-interval matching between two LARGE sides.
  *
  * The naive formulation (`points.join(intervals, lo <= p && p < hi)`) has
  * no equi-predicate, so Catalyst plans a broadcast-nested-loop or a
  * cartesian product — both are O(|P|·|I|) and unusable when neither side
  * broadcasts. This operator restores an equi-key by bucketizing the range
  * dimension: every interval is exploded to the buckets it covers
  * (`floor(lo/w) .. floor(hi/w)`, usually 1–2 rows when `w` is chosen near
  * the typical interval length), every point maps to exactly one bucket,
  * and the join becomes a plain shuffle-hash/sort-merge on
  * (equiKeys…, bucket) followed by the exact range predicate as a filter.
  * Cost: one shuffle of |P| + (len/w + 1)·|I| rows — the standard banded
  * interval-join used for trade/quote and IP-geolocation joins at scale.
  *
  * Contrast with [[AsOfJoin]]: as-of attaches ONE row (the latest ≤ ts);
  * a range join attaches EVERY interval containing the point.
  */
object RangeJoin {

  /** Join `points` to the `intervals` whose `[loCol, hiCol)` half-open
    * range contains `pointCol`. All three range columns must be integral
    * (LONG-compatible — epoch millis/micros, block heights, byte offsets);
    * convert timestamps with `unix_millis` first so bucket arithmetic is
    * exact.
    *
    * @param points      side carrying a point column
    * @param intervals   side carrying [lo, hi) columns; intervals spanning
    *                    many buckets replicate once per covered bucket —
    *                    pick `bucketWidth` ≥ the typical interval length
    * @param pointCol    point column on `points`
    * @param loCol       inclusive lower bound on `intervals`
    * @param hiCol       exclusive upper bound on `intervals`
    * @param bucketWidth bucket size in the range dimension's units
    * @param equiKeys    extra equi-key columns present on BOTH sides; they
    *                    sharpen the shuffle key (and are required for
    *                    correctness when ranges are per-entity timelines)
    * @param maxBucketsPerInterval data-quality fuse: an interval covering
    *                    more buckets than this raises at runtime instead of
    *                    exploding to millions of replica rows (one
    *                    corrupted `lo = 0` row against epoch-ms bounds
    *                    would otherwise OOM an executor or hit Spark's
    *                    sequence-length cap mid-job with a cryptic error)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      equiKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    // integral only: with fractional range columns the bucket cover
    // (floor(lo/w) .. floor((hi-1)/w)) is computed on hi-1, which skips
    // the bucket of any point in (hi-1, hi) — silently WRONG results, so
    // fail fast at plan time instead.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    Seq(points -> pointCol, intervals -> loCol, intervals -> hiCol).foreach {
      case (df, c) =>
        val dt = df.schema(c).dataType
        require(integral.contains(dt),
          s"range column $c must be integral (epoch millis/micros, heights, " +
            s"offsets) — got $dt; convert timestamps with unix_millis first")
    }
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- equiKeys
    require(overlap.isEmpty,
      s"non-key columns $overlap exist on both sides — rename one side first")
    require(!points.columns.contains("_bucket") &&
      !intervals.columns.contains("_bucket"),
      "column _bucket is reserved by RangeJoin")

    // decimal floor-div, not `/` (double): double division is only exact
    // below 2^53, and bucket ids must be exact for the equi-key to match.
    def bucketOf(c: Column): Column =
      floor(c.cast("decimal(38,0)") / bucketWidth).cast("long")
    val p = points.withColumn("_bucket", bucketOf(col(pointCol)))
    // hi is exclusive: an interval ending exactly on a bucket boundary does
    // not cover that bucket — hence (hi - 1) / w for the last covered one.
    // Empty intervals (lo >= hi) produce a null sequence and drop out in
    // the explode, matching the vacuous-match semantics of lo <= p < hi.
    val firstB = bucketOf(col(loCol))
    val lastB = bucketOf(col(hiCol) - 1)
    val iv = intervals.withColumn("_bucket",
      explode(when(col(loCol) >= col(hiCol), lit(null).cast("array<bigint>"))
        .when(lastB - firstB >= maxBucketsPerInterval, raise_error(concat(
          lit(s"RangeJoin: interval covers > $maxBucketsPerInterval buckets ["),
          col(loCol), lit(", "), col(hiCol),
          lit(s") @ width $bucketWidth — corrupt bound, or raise " +
            "maxBucketsPerInterval"))))
        .otherwise(sequence(firstB, lastB))))
    p.join(iv, Seq("_bucket") ++ equiKeys)
      .where(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) layout clustering — the multi-dimensional
  * data-skipping lever (Delta/Iceberg `OPTIMIZE ZORDER BY` analog): sort
  * rows by the bit-interleaved curve value of several dimensions before
  * writing, so every output file / parquet row group covers a compact
  * rectangle in dimension space and its min/max footer stats become
  * selective for ANY of the dimensions. A single-column sort gives
  * perfect skipping on one dim and none on the others; the z-curve
  * spends the ordering budget across all dims.
  *
  * At 100 TB this is a table-maintenance pass (run with [[Compactor]]
  * under the same single-writer window): `repartitionByRange` on the
  * curve value (range exchange = one shuffle, contiguous curve segments
  * per task) + `sortWithinPartitions` keeps the write fully distributed;
  * no step depends on corpus size beyond that one shuffle.
  *
  * Determinism: quantization is INTEGER arithmetic against caller-supplied
  * (or one bounded 2-row driver action's) min/max bounds, and the
  * interleave is a fixed shift/or tree — the curve value is a pure
  * function of the row, reproducible across engines (the DuckDB oracle
  * mirrors it bit-for-bit).
  */
object ZOrder {

  /** Bits per dimension. 16 bits × up to 4 dims packs into a long. */
  val DimBits = 16

  /** Quantize `c` into [0, 2^DimBits) against inclusive bounds. Values are
    * clamped, so out-of-bounds rows degrade to curve endpoints instead of
    * corrupting the interleave. Floor division of non-negative longs —
    * exact (and DuckDB-`//`-identical) while (v−min)·(2^b−1) ≤ 2^53,
    * i.e. dimension ranges up to ~2^37; beyond that, pre-scale the dim.
    */
  def quantize(c: Column, min: Long, max: Long): Column = {
    val range = math.max(1L, max - min)
    val clamped = greatest(lit(min), least(lit(max), c.cast("long")))
    floor(((clamped - lit(min)) * lit((1L << DimBits) - 1)) / lit(range))
      .cast("long")
  }

  /** The Morton value: bit i of quantized dim d lands at position
    * i·nDims + d. Built as a fixed fold of shift/or terms — codegen
    * collapses it into straight-line primitive ops.
    */
  def zvalue(quantized: Seq[Column]): Column = {
    val n = quantized.size
    require(n >= 1 && n * DimBits <= 63, s"$n dims exceed long capacity")
    val terms = for {
      (q, d) <- quantized.zipWithIndex
      i <- 0 until DimBits
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Quantize each (column, min, max) dim and interleave. */
  def curve(dims: Seq[(Column, Long, Long)]): Column =
    zvalue(dims.map { case (c, mn, mx) => quantize(c, mn, mx) })

  /** Write `df` z-ordered by `dims` into `files` parquet files. Bounds
    * come from ONE bounded driver action (a 2·|dims|-value aggregate row —
    * the same shape as a range-partitioner sample pass).
    */
  def writeLayout(df: DataFrame, dimCols: Seq[String], path: String,
                  files: Int): Unit = {
    val aggs = dimCols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val dims = dimCols.zipWithIndex.map { case (c, i) =>
      (col(c), bounds.getLong(2 * i), bounds.getLong(2 * i + 1))
    }
    df.withColumn("_z", curve(dims))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}

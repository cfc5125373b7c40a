package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CountMinAggregator

/** Incrementally maintained Count-Min sketch — frequency statistics over an
  * append-only corpus WITHOUT ever re-scanning history (the
  * [[IncrementalAgg]] maintenance discipline applied to a sketch instead of
  * keyed aggregates).
  *
  * Why Count-Min specifically: its merge is pointwise addition, so
  * fold(batches) equals the one-shot sketch of the union EXACTLY — not
  * approximately — under any batch split, arrival order, or parallelism
  * (see [[CountMinAggregator]]). An incrementally-maintained Misra–Gries
  * summary would drift with batch boundaries; the CM sketch cannot. That
  * makes the maintained state as trustworthy as a full re-scan while each
  * refresh costs one pass over the DELTA plus a 32 KiB driver-side add.
  *
  * State layout: one versioned directory per refresh (`v<N>[_b<ID>]`,
  * the [[IncrementalAgg.updateTable]] crash-safety pattern): `_SUCCESS`
  * marks the commit, uncommitted leftovers from a crashed refresh are
  * swept, and a refresh whose `batchId` matches the last committed version
  * is a replay and returns the existing state unchanged — so an at-least-
  * once upstream (the A5 sink's world) cannot double-count a batch. The
  * state itself is ONE row (depth, width, counters) — constant bytes at
  * any corpus size; history never participates in a refresh.
  */
object SketchMaintenance {

  /** One batch's sketch partial: a single distributed pass over the delta.
    * Null keys are skipped (a null occurs zero times, matching the
    * aggregate-function convention).
    */
  def batchPartial(batch: DataFrame, keyCol: Column,
      depth: Int, width: Int): Array[Long] =
    batch.select(keyCol.cast("string").as("k"))
      .filter(col("k").isNotNull)
      .as(Encoders.STRING)
      .select(new CountMinAggregator(depth, width).toColumn)
      .head().toArray

  /** Last committed sketch at `path`, or None. */
  def read(spark: SparkSession, path: String): Option[(Int, Int, Array[Long])] = {
    VersionedState.committed(spark, path).lastOption.map { case (_, _, name) =>
      val row = spark.read.parquet(s"$path/$name").head()
      (row.getAs[Int]("depth"), row.getAs[Int]("width"),
        row.getAs[scala.collection.Seq[Long]]("counters").toArray)
    }
  }

  /** Fold `batch` into the maintained sketch at `path`; returns the merged
    * counters. Replayed `batchId` → no-op returning the committed state.
    * A depth/width mismatch with the stored state fails loudly — silently
    * re-bucketing counters would corrupt every future estimate.
    */
  def update(spark: SparkSession, path: String, batch: DataFrame,
      keyCol: Column, depth: Int, width: Int,
      batchId: Option[Long] = None): Array[Long] = {
    val committed = VersionedState.sweepAndList(spark, path)

    // shape check runs BEFORE the replay guard: a replayed batch from a
    // reconfigured caller must fail loudly too, never hand back counters
    // the caller will index with the wrong geometry
    def checkedRow(name: String): org.apache.spark.sql.Row = {
      val row = spark.read.parquet(s"$path/$name").head()
      require(row.getAs[Int]("depth") == depth &&
        row.getAs[Int]("width") == width,
        s"sketch shape mismatch: stored ${row.getAs[Int]("depth")}x" +
          s"${row.getAs[Int]("width")}, refresh ${depth}x$width")
      row
    }
    committed.lastOption match {
      case Some((_, lastBatch, name))
          if batchId.isDefined && lastBatch == batchId =>
        return checkedRow(name).getAs[scala.collection.Seq[Long]]("counters").toArray
      case _ =>
    }

    val delta = batchPartial(batch, keyCol, depth, width)
    val merged = committed.lastOption match {
      case None => delta
      case Some((_, _, name)) =>
        val prev = checkedRow(name)
          .getAs[scala.collection.Seq[Long]]("counters").toArray
        var i = 0
        while (i < prev.length) { prev(i) += delta(i); i += 1 }
        prev
    }
    val nextName = VersionedState.nextName(committed, batchId)
    import spark.implicits._
    Seq((depth, width, merged.toSeq)).toDF("depth", "width", "counters")
      .coalesce(1)
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$path/$nextName")
    VersionedState.prune(spark, path, committed)
    merged
  }
}

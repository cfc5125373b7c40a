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
    committedVersions(spark, path).lastOption.map { case (_, _, name) =>
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
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = allVersions(spark, path)
    val committed = all.filter { case (_, _, name) =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$name/_SUCCESS")) }
    all.diff(committed).foreach { case (_, _, name) =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$name"), true) }

    committed.lastOption match {
      case Some((_, lastBatch, name))
          if batchId.isDefined && lastBatch == batchId =>
        val row = spark.read.parquet(s"$path/$name").head()
        return row.getAs[scala.collection.Seq[Long]]("counters").toArray
      case _ =>
    }

    val delta = batchPartial(batch, keyCol, depth, width)
    val merged = committed.lastOption match {
      case None => delta
      case Some((_, _, name)) =>
        val row = spark.read.parquet(s"$path/$name").head()
        require(row.getAs[Int]("depth") == depth &&
          row.getAs[Int]("width") == width,
          s"sketch shape mismatch: stored ${row.getAs[Int]("depth")}x" +
            s"${row.getAs[Int]("width")}, refresh ${depth}x$width")
        val prev = row.getAs[scala.collection.Seq[Long]]("counters").toArray
        var i = 0
        while (i < prev.length) { prev(i) += delta(i); i += 1 }
        prev
    }
    val next = all.lastOption.map(_._1).getOrElse(0L) + 1
    val nextName = s"v$next" + batchId.map(id => s"_b$id").getOrElse("")
    import spark.implicits._
    Seq((depth, width, merged.toSeq)).toDF("depth", "width", "counters")
      .coalesce(1)
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$path/$nextName")
    committed.foreach { case (_, _, name) =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$name"), true) }
    merged
  }

  private val VerDir = """v(\d+)(?:_b(\d+))?""".r

  private def allVersions(spark: SparkSession,
      path: String): Seq[(Long, Option[Long], String)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq()
    else fs.listStatus(root).map(_.getPath.getName).toSeq.collect {
      case name @ VerDir(v, b) => (v.toLong, Option(b).map(_.toLong), name)
    }.sortBy(_._1)
  }

  private def committedVersions(spark: SparkSession,
      path: String): Seq[(Long, Option[Long], String)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    allVersions(spark, path).filter { case (_, _, name) =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$name/_SUCCESS")) }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained HyperLogLog distinct-count sketch — the
  * cardinality sibling of [[SketchMaintenance]]'s frequency sketch:
  * "distinct users/wallets/keys so far" refreshed per delta batch, history
  * never re-scanned. Built on Spark's DataSketches HLL surface
  * (`hll_sketch_agg` / `hll_union` / `hll_sketch_estimate`, Spark ≥ 3.5) —
  * the sketch bytes ARE the state, unions are associative, and a union
  * with a replayed batch is guarded out by the batch-id commit (HLL union
  * is idempotent for identical sketches, but the guard also skips the
  * delta pass entirely).
  *
  * Unlike Count-Min's pointwise-add, a folded HLL sketch is NOT
  * byte-identical to the one-shot aggregate (coupon promotion paths
  * differ), so the maintained estimate carries the standard HLL accuracy
  * contract instead: rse ≈ 1.04/√(2^lgK) (~1.6% at lgK=12), asserted
  * against exact counts in the spec and as a guarantee-verdict in the
  * declared query.
  *
  * State: one row (lgk, sketch BINARY) in versioned crash-safe directories
  * (`v<N>[_b<ID>]`, the [[IncrementalAgg.updateTable]] pattern) — constant
  * bytes (≤ ~2^lgK) at any corpus size.
  */
object HllMaintenance {

  /** One batch's HLL sketch bytes: a single distributed pass. Null keys
    * are skipped (a null occurs zero times).
    */
  def batchSketch(batch: DataFrame, keyCol: Column, lgK: Int): Array[Byte] =
    batch.select(keyCol.cast("string").as("k"))
      .filter(col("k").isNotNull)
      .select(expr(s"hll_sketch_agg(k, $lgK)").as("s"))
      .head().getAs[Array[Byte]](0)

  /** Estimate from sketch bytes (round-tripped through the SQL surface so
    * exactly the shipped estimator runs).
    */
  def estimate(spark: SparkSession, sketch: Array[Byte]): Long = {
    import spark.implicits._
    Seq(Tuple1(sketch)).toDF("s")
      .select(expr("hll_sketch_estimate(s)")).head().getLong(0)
  }

  /** Last committed (lgk, sketch) at `path`, or None. */
  def read(spark: SparkSession, path: String): Option[(Int, Array[Byte])] =
    VersionedState.committed(spark, path).lastOption.map { case (_, _, name) =>
      val row = spark.read.parquet(s"$path/$name").head()
      (row.getAs[Int]("lgk"), row.getAs[Array[Byte]]("sketch"))
    }

  /** Union `batch`'s sketch into the maintained state; returns the merged
    * sketch bytes. Replayed `batchId` → no-op returning the committed
    * sketch. lgK mismatch with stored state fails loudly.
    */
  def update(spark: SparkSession, path: String, batch: DataFrame,
      keyCol: Column, lgK: Int, batchId: Option[Long] = None): Array[Byte] = {
    val comm = VersionedState.sweepAndList(spark, path)

    // shape check BEFORE the replay guard — a replayed batch from a
    // reconfigured caller must fail loudly, never return bytes the caller
    // will estimate with the wrong lgK
    def checkedRow(name: String): org.apache.spark.sql.Row = {
      val row = spark.read.parquet(s"$path/$name").head()
      require(row.getAs[Int]("lgk") == lgK,
        s"sketch shape mismatch: stored lgK=${row.getAs[Int]("lgk")}, " +
          s"refresh lgK=$lgK")
      row
    }
    comm.lastOption match {
      case Some((_, lastBatch, name))
          if batchId.isDefined && lastBatch == batchId =>
        return checkedRow(name).getAs[Array[Byte]]("sketch")
      case _ =>
    }

    val delta = batchSketch(batch, keyCol, lgK)
    val merged = comm.lastOption match {
      case None => delta
      case Some((_, _, name)) =>
        val prev = checkedRow(name).getAs[Array[Byte]]("sketch")
        import spark.implicits._
        Seq((prev, delta)).toDF("a", "b")
          .select(expr("hll_union(a, b)")).head().getAs[Array[Byte]](0)
    }
    val nextName = VersionedState.nextName(comm, batchId)
    import spark.implicits._
    Seq((lgK, merged)).toDF("lgk", "sketch")
      .coalesce(1)
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$path/$nextName")
    VersionedState.prune(spark, path, comm)
    merged
  }
}

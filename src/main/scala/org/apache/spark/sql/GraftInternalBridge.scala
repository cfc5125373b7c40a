package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Narrow bridge into one `private[sql]` constructor:
  * `SparkSession.internalCreateDataFrame`, which rebuilds a DataFrame from
  * an `RDD[InternalRow]` WITHOUT the external-Row detour (`df.rdd` +
  * `createDataFrame(RDD[Row])` deserializes every field to boxed JVM
  * objects and re-encodes them downstream — a per-row round-trip that
  * matters when the RDD in question is a checkpointed batch being counted
  * and then written).
  *
  * Used by [[graft.operators.IdempotentSink]] to hold a releasable handle
  * on its checkpoint blocks while keeping rows in Tungsten binary form.
  * Lives in `org.apache.spark.sql` solely to satisfy the access scope; no
  * other private API is touched.
  */
object GraftInternalBridge {

  /** Rows must already be safe to retain (copied) — `toRdd` iterators
    * reuse mutable UnsafeRow buffers.
    */
  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}

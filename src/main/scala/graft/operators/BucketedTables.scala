package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located-join half of the engine's
  * physical-design story (SURVEY.md §4: the reference's B-tree indexes map
  * to partition/sort layout; THIS is the layout that kills the join
  * shuffle).
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted) by the
  * join key means Spark's bucketed scan already satisfies the join's
  * required distribution: the SortMergeJoin runs with NO Exchange on either
  * side — at 100 TB that is the difference between re-shuffling the fact
  * table on every query and reading it join-ready. Asserted in
  * PlanShapeSpec ("bucketed join plans without a shuffle").
  *
  * Constraints that make it work (all standard Spark bucketing rules):
  * both sides bucketed by the join key with compatible bucket counts,
  * `spark.sql.sources.bucketing.enabled=true` (default), and the join key
  * equal to the bucket column. The bucket count is the write-time
  * parallelism knob: pick it so one bucket of the LARGER table fits an
  * executor's memory at target scale.
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted external parquet table registered as
    * `tableName` (bucketing metadata lives in the session catalog; files at
    * `path`).
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Read a bucketed table back (by catalog name — the bucketing metadata
    * only applies through the catalog, not a raw path read).
    */
  def readBucketed(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}

package graft.sources

import graft.SparkSpec

/** Probe: the parquet `_metadata.row_index` column (the deletion-vector
  * substrate) exists and is stable per (file, position) on this runtime.
  */
class RowIndexProbeSpec extends SparkSpec {
  import spark.implicits._
  test("_metadata.row_index is readable and stable") {
    val dir = graft.Tables.scratchDir("rowidx")
    spark.range(0, 100).toDF("id").repartition(4).write.mode("overwrite").parquet(dir)
    import org.apache.spark.sql.functions._
    val m = spark.read.parquet(dir)
      .select(col("id"), col("_metadata.file_path").as("f"),
        col("_metadata.row_index").as("ri"))
    assert(m.count() == 100)
    // per file, row_index is 0..n-1
    val perFile = m.groupBy("f").agg(count(lit(1)).as("n"),
      min("ri").as("lo"), max("ri").as("hi")).collect()
    perFile.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1,
        s"row_index must be dense 0..n-1 per file: $r")
    }
    // stable across reads: the same (f, ri) maps to the same id
    val a = m.collect().map(r => (r.getString(1), r.getLong(2)) -> r.getLong(0)).toMap
    val b = m.collect().map(r => (r.getString(1), r.getLong(2)) -> r.getLong(0)).toMap
    assert(a == b)
  }
}

package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the table-maintenance op every long-running
  * ingest pipeline needs: streaming/micro-batch appends (the
  * [[IdempotentSink]] loop, one file per batch per partition) accrete
  * thousands of tiny parquet files, and at 100 TB the resulting
  * footer-read + task-scheduling overhead dominates scan time long before
  * the data does. Compaction rewrites the table into ~`targetBytes` files
  * sized for the scan path (one row-group per task).
  *
  * The rewrite goes to a sibling temp directory first and swaps via two
  * renames (old → trash, tmp → live). The swap is NOT atomic across the
  * two renames — run it in the same single-writer maintenance window the
  * sink already requires ([[IdempotentSink.appendOnce]] concurrency
  * contract); readers of a transactional table format get atomicity from
  * the format instead.
  */
object Compactor {

  /** Number of data files and total bytes directly under `path`. */
  def stats(spark: SparkSession, path: String): (Int, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f =>
      f.isFile && !f.getPath.getName.startsWith("_"))
    (files.length, files.map(_.getLen).sum)
  }

  /** Compact a table that may be hive-partitioned (the layout
    * [[IdempotentSink.appendOnce]] writes with `partitionCols`): each leaf
    * partition directory compacts independently — which is also the 100 TB
    * shape, since leaves compact in isolation and a maintenance job can
    * target only the partitions the last ingest touched. Flat tables
    * degenerate to a single leaf (the root). Returns summed
    * (filesBefore, filesAfter) over all leaves.
    */
  def compactTable(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: Path): Seq[Path] = {
      val subdirs = fs.listStatus(p).filter(s =>
        s.isDirectory && !s.getPath.getName.startsWith("_"))
      if (subdirs.isEmpty) Seq(p) else subdirs.toSeq.flatMap(s => leaves(s.getPath))
    }
    leaves(root).map(l => compact(spark, l.toString, targetBytes))
      .foldLeft((0, 0)) { case ((b, a), (lb, la)) => (b + lb, a + la) }
  }

  /** Compact ONE flat directory of parquet files into
    * ceil(totalBytes/targetBytes) files. A directory already at or below
    * that file count is left untouched (returns the current count
    * unchanged) — compaction must be cheap to schedule unconditionally.
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0)
    val (nFiles, totalBytes) = stats(spark, path)
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (nOut >= nFiles) return (nFiles, nFiles)

    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "_compact_tmp")
    val trash = new Path(path + "_compact_old")
    fs.delete(tmp, true); fs.delete(trash, true)

    // coalesce, not repartition: compaction must not pay a full shuffle —
    // it only narrows the file count, preserving data order within files.
    spark.read.parquet(path).coalesce(nOut)
      .write.mode(SaveMode.ErrorIfExists).parquet(tmp.toString)

    if (!fs.rename(p, trash))
      throw new java.io.IOException(s"compaction swap failed: $path -> $trash")
    if (!fs.rename(tmp, p)) {
      // restore the original before failing — never leave the table absent
      fs.rename(trash, p)
      throw new java.io.IOException(s"compaction swap failed: $tmp -> $path")
    }
    fs.delete(trash, true)
    (nFiles, stats(spark, path)._1)
  }
}

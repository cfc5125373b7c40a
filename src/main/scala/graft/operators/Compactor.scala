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
  * Crash-safety: the rewrite goes to a DOT-PREFIXED sibling temp directory
  * (hidden from Spark partition discovery and from [[compactTable]]'s leaf
  * walk, so a leftover can never surface as phantom partition data) and
  * swaps via two renames (live → trash, tmp → live). The swap is not
  * atomic across the two renames, but every entry point first runs
  * [[recover]], which completes an interrupted swap from the trash copy —
  * so a crash at any point leaves a table that the next maintenance run
  * (or a manual recover()) restores. Run under the same single-writer
  * maintenance window the sink already requires
  * ([[IdempotentSink.appendOnce]] concurrency contract).
  */
object Compactor {

  private def tmpPath(p: Path) = new Path(p.getParent, s".${p.getName}_compact_tmp")
  private def trashPath(p: Path) = new Path(p.getParent, s".${p.getName}_compact_old")

  /** Finish an interrupted swap at `path`: if the live directory is gone
    * but the trash copy exists, the crash hit between the two renames —
    * promote the trash copy back. Stale tmp dirs are always removed.
    * Safe to call on a healthy table (no-op beyond the tmp sweep).
    */
  def recover(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) && fs.exists(trashPath(p))) {
      if (!fs.rename(trashPath(p), p))
        throw new java.io.IOException(s"recover failed: ${trashPath(p)} -> $path")
    }
    fs.delete(tmpPath(p), true)
    if (fs.exists(p)) fs.delete(trashPath(p), true)
  }

  /** Number of data files and total bytes directly under `path`. */
  def stats(spark: SparkSession, path: String): (Int, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f => f.isFile && !hidden(f.getPath))
    (files.length, files.map(_.getLen).sum)
  }

  private def hidden(p: Path): Boolean =
    p.getName.startsWith("_") || p.getName.startsWith(".")

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
    // The root itself may be mid-swap from an interrupted compact (live dir
    // renamed away, trash copy present): recover BEFORE listing, or
    // listStatus(root) throws instead of healing.
    recover(spark, path)
    def leaves(p: Path): Seq[Path] = {
      // ONE listing serves both the heal probe and the recursion — listing
      // dominates the maintenance walk on object stores, so each directory
      // must be listed exactly once per run (twice only when a heal
      // actually fired and changed the entries).
      val entries = fs.listStatus(p)
      // Heal interrupted leaf swaps first: a crash between the two renames
      // leaves only the hidden .<leaf>_compact_old dir, which the hidden()
      // filter below would skip — so without this probe the leaf's data
      // stays invisible to every reader until a manual recover().
      val names = entries.map(_.getPath.getName).toSet
      val healed = entries
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".")
          && s.getPath.getName.endsWith("_compact_old"))
        .count { s =>
          val liveName = s.getPath.getName.stripPrefix(".").stripSuffix("_compact_old")
          // live-sibling presence answered from the snapshot we already
          // hold — no extra exists() round trip per trash dir
          val heal = !names.contains(liveName)
          if (heal) recover(spark, new Path(p, liveName).toString)
          heal
        }
      val fresh = if (healed > 0) fs.listStatus(p) else entries
      val subdirs = fresh.filter(s => s.isDirectory && !hidden(s.getPath))
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
    recover(spark, path)
    val (nFiles, totalBytes) = stats(spark, path)
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (nOut >= nFiles) return (nFiles, nFiles)

    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = tmpPath(p)
    val trash = trashPath(p)

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

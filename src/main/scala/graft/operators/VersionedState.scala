package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared crash-safe versioned-state directory machinery — the
  * `v<N>[_b<ID>]` pattern used by [[IncrementalAgg.updateTable]],
  * [[SketchMaintenance]], and [[HllMaintenance]]: `_SUCCESS` marks a
  * commit, uncommitted leftovers from a crashed refresh are swept, the
  * last committed version's batch id backs the replay guard, and old
  * committed versions prune after a successful write. One implementation
  * so the crash-safety semantics cannot drift between the three state
  * stores.
  */
private[operators] object VersionedState {

  private val VerDir = """v(\d+)(?:_b(\d+))?""".r

  /** (version, batchId, dirName), version-sorted — every dir matching the
    * naming scheme, committed or not.
    */
  def allVersions(spark: SparkSession,
      path: String): Seq[(Long, Option[Long], String)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq()
    else fs.listStatus(root).map(_.getPath.getName).toSeq.collect {
      case name @ VerDir(v, b) => (v.toLong, Option(b).map(_.toLong), name)
    }.sortBy(_._1)
  }

  /** The committed subset of [[allVersions]]. */
  def committed(spark: SparkSession,
      path: String): Seq[(Long, Option[Long], String)] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    allVersions(spark, path).filter { case (_, _, name) =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$name/_SUCCESS")) }
  }

  /** Sweep uncommitted leftovers (crashed refreshes); the returned list —
    * the surviving, committed versions — is then also the full version
    * list for [[nextName]].
    */
  def sweepAndList(spark: SparkSession,
      path: String): Seq[(Long, Option[Long], String)] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = allVersions(spark, path)
    val comm = all.filter { case (_, _, name) =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$name/_SUCCESS")) }
    all.diff(comm).foreach { case (_, _, name) =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$name"), true) }
    comm
  }

  /** The next version's directory name. */
  def nextName(all: Seq[(Long, Option[Long], String)],
      batchId: Option[Long]): String =
    s"v${all.lastOption.map(_._1).getOrElse(0L) + 1}" +
      batchId.map(id => s"_b$id").getOrElse("")

  /** Delete superseded committed versions after a successful write. */
  def prune(spark: SparkSession, path: String,
      old: Seq[(Long, Option[Long], String)]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    old.foreach { case (_, _, name) =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$name"), true) }
  }
}

package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame

/** J13: the `graft-table-changes` streaming source — parity with the batch
  * change feed across every commit class, version-offset draining under
  * the per-batch cap, and kill-and-restart continuity (no version lost,
  * none re-delivered).
  */
class ChangeFeedSourceSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_cdf_src").toString + "/t"

  private def drain(src: DataFrame, name: String): DataFrame = {
    val q = src.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft_cdf_ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  private type ChangeRow = (Long, Option[Long], String, Int)
  private def rowsOf(df: DataFrame): Set[ChangeRow] =
    df.select("id", "v", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getString(2), r.getInt(3)))
      .toSet

  test("streamed feed equals the batch feed across append/overwrite/merge/optimize") {
    val t = freshTable()
    SnapshotTable.commitAppend(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    SnapshotTable.commitAppend(spark, t, Seq((3L, 30L)).toDF("id", "v"))
    SnapshotTable.commitOverwrite(spark, t, Seq((1L, 11L), (3L, 31L)).toDF("id", "v"))
    SnapshotTable.commitMerge(spark, t,
      Seq((1L, 99L), (4L, 40L)).toDF("id", "v"), keyCols = Seq("id"))
    SnapshotTable.optimizeCompact(spark, t) // may or may not commit; either way silent
    val cur = SnapshotTable.currentVersion(spark, t)
    val want = rowsOf(SnapshotTable.changes(spark, t, 0, cur))
    // cap 1 version per micro-batch: the feed must drain across ≥4 batches
    val got = rowsOf(drain(
      spark.readStream.format("graft-table-changes")
        .option("path", t).option("maxVersionsPerBatch", 1).load(),
      "graft_cdf_src_parity"))
    assert(got == want, s"missing ${want -- got}, extra ${got -- want}")
    // sanity on the classes: the merge version must carry update images
    assert(got.exists(_._3 == "update_preimage") && got.exists(_._3 == "update_postimage"))
    assert(got.exists(_._3 == "delete") && got.exists(_._3 == "insert"))
  }

  test("kill-and-restart on one checkpoint: no version lost, none re-delivered") {
    val t = freshTable()
    val ck = Files.createTempDirectory("graft_cdf_ck2").toString
    SnapshotTable.commitAppend(spark, t, Seq((1L, 10L)).toDF("id", "v"))
    SnapshotTable.commitAppend(spark, t, Seq((2L, 20L)).toDF("id", "v"))
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recovery-capable sink shape (and the production one)
    def run(name: String): Set[ChangeRow] = {
      val got = scala.collection.mutable.Set[ChangeRow]()
      val q = spark.readStream.format("graft-table-changes")
        .option("path", t).option("maxVersionsPerBatch", 1).load()
        .writeStream
        .foreachBatch((batch: DataFrame, _: Long) => { got ++= rowsOf(batch); () })
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
      got.toSet
    }
    val first = run("graft_cdf_src_r1")
    assert(first.map(_._4) == Set(1, 2), s"first run must consume v1..v2: $first")
    // the "killed" stream's checkpoint now holds offset 2; more commits land
    SnapshotTable.commitMerge(spark, t, Seq((1L, 99L), (3L, 30L)).toDF("id", "v"), Seq("id"))
    SnapshotTable.commitOverwrite(spark, t, Seq((9L, 90L)).toDF("id", "v"))
    val second = run("graft_cdf_src_r2")
    // a restarted query's memory sink starts empty: exactly v3..v4, nothing
    // of v1..v2 re-delivered
    assert(second.map(_._4) == Set(3, 4), s"restart must resume at v3: $second")
    assert(second == rowsOf(SnapshotTable.changes(spark, t, 2, 4)))
  }

  test("unsupported column types and missing tables fail loudly at construction") {
    val t = freshTable()
    SnapshotTable.commitAppend(spark, t,
      Seq((1L, Seq(1, 2))).toDF("id", "xs")) // array column: unsupported
    val e = intercept[Exception] {
      spark.readStream.format("graft-table-changes").option("path", t).load()
    }
    assert(e.getMessage.contains("flat primitive"), e.getMessage)
    intercept[Exception] {
      spark.readStream.format("graft-table-changes")
        .option("path", freshTable()).load() // no commits
    }
  }
}

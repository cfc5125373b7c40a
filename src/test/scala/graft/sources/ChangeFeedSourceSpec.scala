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

  // round-15 regression: the streamed feed must apply pre-version deletion
  // vectors exactly as the batch feed does — an overwrite retiring a DV'd
  // file emits each hidden row's delete ONCE, and a restore emits the dv
  // diff (resurrections/re-hides), never the raw file contents.
  test("streamed feed parity under MoR delete + overwrite + restore (dv interplay)") {
    val t = freshTable()
    SnapshotTable.commitAppend(spark, t,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v").coalesce(1))
    SnapshotTable.commitDeleteMoR(spark, t,
      org.apache.spark.sql.functions.col("id") === 2L)        // v2: {1,3}
    SnapshotTable.commitOverwrite(spark, t, Seq((9L, 90L)).toDF("id", "v")) // v3
    SnapshotTable.restore(spark, t, 2)                        // v4: {1,3}
    SnapshotTable.restore(spark, t, 1)                        // v5: {1,2,3} (dv reset)
    val cur = SnapshotTable.currentVersion(spark, t)
    assert(cur == 5)
    val want = rowsOf(SnapshotTable.changes(spark, t, 0, cur))
    val got = rowsOf(drain(
      spark.readStream.format("graft-table-changes")
        .option("path", t).option("maxVersionsPerBatch", 1).load(),
      "graft_cdf_src_dv"))
    assert(got == want, s"missing ${want -- got}, extra ${got -- want}")
    // the overwrite (v3) must NOT re-emit the already-hidden row 2
    assert(!got.contains((2L, Some(20L), "delete", 3)),
      "v3 re-emitted a row v2's deletion vector already hid")
    assert(got.count(x => x._1 == 2L && x._3 == "delete") == 1)
    // the dv-reset restore (v5) resurrects ONLY row 2
    assert(got.filter(_._4 == 5) == Set((2L, Some(20L), "insert", 5)))
    // ±1 fold over the streamed feed matches the table at every version
    (1 to cur).foreach { v =>
      val folded = got.toSeq.filter(_._4 <= v)
        .sortBy(x => (x._4, if (x._3 == "delete" || x._3 == "update_preimage") 0 else 1))
        .foldLeft(Map.empty[Long, Long]) {
          case (m, (id, _, "delete" | "update_preimage", _)) => m - id
          case (m, (id, Some(value), "insert" | "update_postimage", _)) => m + (id -> value)
          case (m, _) => m
        }
      val table = SnapshotTable.read(spark, t, Some(v))
        .as[(Long, Long)].collect().toMap
      assert(folded == table, s"streamed fold diverges at v$v: $folded != $table")
    }
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

package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** A16: transaction-log table format — commit atomicity, snapshot
  * isolation, time travel, checkpoint-bounded replay, concurrent-writer
  * serialization, vacuum.
  */
class SnapshotTableSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_snap_spec").toString + "/t"

  private def ids(table: String, asOf: Option[Int] = None): Set[Long] =
    SnapshotTable.read(spark, table, asOf).select("id").as[Long].collect().toSet

  test("append commits accumulate; overwrite retires; time travel reads every version") {
    val t = freshTable()
    assert(SnapshotTable.currentVersion(spark, t) == 0)
    assert(SnapshotTable.commitAppend(spark, t, Seq(1L, 2L).toDF("id")) == 1)
    assert(SnapshotTable.commitAppend(spark, t, Seq(3L).toDF("id")) == 2)
    assert(SnapshotTable.commitOverwrite(spark, t, Seq(9L).toDF("id")) == 3)
    assert(ids(t, Some(1)) == Set(1L, 2L))
    assert(ids(t, Some(2)) == Set(1L, 2L, 3L))
    assert(ids(t, Some(3)) == Set(9L))
    assert(ids(t) == Set(9L))
    // overwritten files stay physical until vacuum: time travel still works
    assert(ids(t, Some(2)) == Set(1L, 2L, 3L))
  }

  test("empty overwrite returns an empty frame WITH the committed schema") {
    val t = freshTable()
    SnapshotTable.commitAppend(spark, t, Seq((1L, "a")).toDF("id", "name"))
    SnapshotTable.commitOverwrite(spark, t,
      Seq.empty[(Long, String)].toDF("id", "name"))
    val cur = SnapshotTable.read(spark, t)
    assert(cur.count() == 0)
    assert(cur.columns.toSeq == Seq("id", "name"))
    assert(ids(t, Some(1)) == Set(1L))
  }

  test("checkpoint bounds replay: pre-checkpoint log entries can vanish and reads still resolve") {
    val t = freshTable()
    (1 to 12).foreach(i => SnapshotTable.commitAppend(spark, t, Seq(i.toLong).toDF("id")))
    // checkpoints land at v10 — delete every earlier commit entry; latest
    // and as-of-11 reads must survive on checkpoint + tail alone
    val logDir = new java.io.File(t, "_graft_log")
    (1 to 9).foreach { v =>
      assert(new java.io.File(logDir, f"v$v%010d.json").delete(), s"v$v entry should exist")
    }
    assert(ids(t) == (1 to 12).map(_.toLong).toSet)
    assert(ids(t, Some(11)) == (1 to 11).map(_.toLong).toSet)
    // ...but a pre-checkpoint as-of is genuinely gone — loud, not wrong
    intercept[Exception](ids(t, Some(5)))
  }

  test("concurrent appends serialize through the version claim; both land") {
    val t = freshTable()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = SnapshotTable.commitAppend(spark, t, Seq(i.toLong * 100).toDF("id"))
        })
      }
      val versions = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(versions.toSet == (1 to 8).toSet, "each commit must claim a distinct version")
      assert(ids(t) == (1 to 8).map(_.toLong * 100).toSet)
    } finally pool.shutdownNow()
  }

  test("snapshot isolation: a resolved snapshot is immune to later commits") {
    val t = freshTable()
    SnapshotTable.commitAppend(spark, t, Seq(1L).toDF("id"))
    val snap = SnapshotTable.snapshot(spark, t)
    SnapshotTable.commitOverwrite(spark, t, Seq(2L).toDF("id"))
    // plan against the captured file list: still version-1 content
    val asCaptured = spark.read.parquet(
      snap.files.map(f => new org.apache.hadoop.fs.Path(t, f).toString): _*)
    assert(asCaptured.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("vacuum deletes only files outside the retention horizon; retained time travel survives") {
    val t = freshTable()
    SnapshotTable.commitAppend(spark, t, Seq(1L).toDF("id"))
    SnapshotTable.commitOverwrite(spark, t, Seq(2L).toDF("id"))
    SnapshotTable.commitOverwrite(spark, t, Seq(3L).toDF("id"))
    val removed = SnapshotTable.vacuum(spark, t, retainVersions = 1)
    assert(removed > 0, "version-1 files are unreferenced by v2..v3 and must go")
    assert(ids(t) == Set(3L))
    assert(ids(t, Some(2)) == Set(2L)) // inside horizon: intact
    // v1's log entry still exists, but its files are gone — reading it
    // must fail loudly rather than silently return partial data
    intercept[Exception](ids(t, Some(1)))
  }

  test("commitStreamBatch: duplicate and stale batch ids no-op; fresh ids commit") {
    val t = freshTable()
    assert(SnapshotTable.commitStreamBatch(spark, t, Seq(1L).toDF("id"), "app", 0L) == 1)
    assert(SnapshotTable.commitStreamBatch(spark, t, Seq(2L).toDF("id"), "app", 1L) == 2)
    // exact duplicate (failure redelivery) and an older epoch (zombie
    // writer) both skip without a version bump or content change
    assert(SnapshotTable.commitStreamBatch(spark, t, Seq(99L).toDF("id"), "app", 1L) == 2)
    assert(SnapshotTable.commitStreamBatch(spark, t, Seq(99L).toDF("id"), "app", 0L) == 2)
    assert(ids(t) == Set(1L, 2L))
    // a DIFFERENT writer app is an independent txn sequence
    assert(SnapshotTable.commitStreamBatch(spark, t, Seq(3L).toDF("id"), "other", 0L) == 3)
    assert(ids(t) == Set(1L, 2L, 3L))
  }

  test("txn watermarks survive the checkpoint: dedup works after the log prefix vanishes") {
    val t = freshTable()
    (0 until 12).foreach { i =>
      SnapshotTable.commitStreamBatch(spark, t, Seq(i.toLong).toDF("id"), "app", i.toLong)
    }
    val logDir = new java.io.File(t, "_graft_log")
    (1 to 9).foreach(v => assert(new java.io.File(logDir, f"v$v%010d.json").delete()))
    // replayed batch 5 was recorded BEFORE the checkpoint at v10: the
    // checkpoint's txn map alone must still reject it
    assert(SnapshotTable.commitStreamBatch(spark, t, Seq(555L).toDF("id"), "app", 5L) == 12)
    assert(ids(t) == (0 until 12).map(_.toLong).toSet)
  }

  test("data skipping: stats prune disjoint-range files; statless files always read") {
    val t = freshTable()
    SnapshotTable.commitAppend(spark, t, (1L to 10L).toDF("id"), statsCols = Seq("id"))
    SnapshotTable.commitAppend(spark, t, (11L to 20L).toDF("id"), statsCols = Seq("id"))
    SnapshotTable.commitAppend(spark, t, (21L to 30L).toDF("id"), statsCols = Seq("id"))
    // no stats on this one: it must survive every plan
    SnapshotTable.commitAppend(spark, t, Seq(15L).toDF("id"))
    val snap = SnapshotTable.snapshot(spark, t)
    def rng(lo: Double, hi: Double) = Seq(("id", lo, hi))
    val (planned, total) = SnapshotTable.planPruned(spark, t, rng(12.0, 13.0))
    assert(total == snap.files.size && planned.size < total)
    val statless = snap.files.filterNot(snap.stats.contains)
    assert(statless.nonEmpty && statless.forall(planned.contains),
      "files without stats must never be skipped")
    // correctness: pruned read + row filter ≡ full read + row filter
    val viaPruned = SnapshotTable.readPruned(spark, t, rng(12.0, 13.0))
      .filter($"id" >= 12 && $"id" <= 13).as[Long].collect().toSet
    assert(viaPruned == Set(12L, 13L))
    // a range that only the statless file could hold still finds its row
    val edge = SnapshotTable.readPruned(spark, t, rng(15.0, 15.0))
      .filter($"id" === 15).as[Long].collect().toList
    assert(edge.count(_ == 15L) == 2,
      s"both 15s (ranged file + statless file) must surface: $edge")
  }

  test("z-ordered commit: multi-dim stats prune on EITHER dimension; content preserved") {
    val t = freshTable()
    // 32x32 grid: every (x, y) pair once — the adversarial case for a
    // single-dim sort (y-ranges full-width in every x-sorted file)
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    SnapshotTable.commitZOrdered(spark, t, grid,
      bounds = Seq(("x", 0L, 31L), ("y", 0L, 31L)), nFiles = 16)
    val snap = SnapshotTable.snapshot(spark, t)
    assert(snap.files.size > 4, s"range partitioner must spread files: ${snap.files.size}")
    // a quarter-band on x alone AND on y alone must each prune files —
    // the property a lexicographic (x, y) sort fails for y
    val (px, tot) = SnapshotTable.planPruned(spark, t, Seq(("x", 0.0, 7.0)))
    val (py, _) = SnapshotTable.planPruned(spark, t, Seq(("y", 0.0, 7.0)))
    assert(px.size < tot, s"x-band must prune (${px.size}/$tot)")
    assert(py.size < tot, s"y-band must prune (${py.size}/$tot)")
    // conjunctive 2-dim band prunes at least as hard as either alone
    val (pxy, _) = SnapshotTable.planPruned(spark, t,
      Seq(("x", 0.0, 7.0), ("y", 0.0, 7.0)))
    assert(pxy.size <= math.min(px.size, py.size))
    // correctness: pruned band read ≡ direct filter of the grid
    val got = SnapshotTable.readPruned(spark, t, Seq(("x", 0.0, 7.0), ("y", 0.0, 7.0)))
      .filter($"x" <= 7 && $"y" <= 7).count()
    assert(got == 64, s"band must hold exactly 8x8 rows: $got")
    // clustering must not lose or duplicate rows
    assert(SnapshotTable.read(spark, t).count() == 1024)
  }

  test("change feed: per-version inserts and deletes, bounded ranges, loud on missing log") {
    val t = freshTable()
    SnapshotTable.commitAppend(spark, t, Seq(1L, 2L).toDF("id"))
    SnapshotTable.commitAppend(spark, t, Seq(3L).toDF("id"))
    SnapshotTable.commitOverwrite(spark, t, Seq(9L).toDF("id"))
    val all = SnapshotTable.changes(spark, t, 0, 3)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Int)].collect().toSet
    assert(all == Set(
      (1L, "insert", 1), (2L, "insert", 1), (3L, "insert", 2),
      (1L, "delete", 3), (2L, "delete", 3), (3L, "delete", 3),
      (9L, "insert", 3)))
    // bounded range: only the overwrite's changes
    val tail = SnapshotTable.changes(spark, t, 2, 3)
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(tail == Set((1L, "delete"), (2L, "delete"), (3L, "delete"), (9L, "insert")))
    intercept[IllegalArgumentException](SnapshotTable.changes(spark, t, 3, 3))
    intercept[IllegalArgumentException](SnapshotTable.changes(spark, t, 0, 4))
  }

  test("cleanupLog retires absorbed entries; reads and tail time travel survive") {
    val t = freshTable()
    (1 to 23).foreach(i => SnapshotTable.commitAppend(spark, t, Seq(i.toLong).toDF("id")))
    val removed = SnapshotTable.cleanupLog(spark, t, retainVersions = 3)
    assert(removed > 0, "entries below the checkpoint horizon must retire")
    // latest + tail time travel resolve from checkpoint 20 + retained tail
    assert(ids(t) == (1 to 23).map(_.toLong).toSet)
    assert(ids(t, Some(21)) == (1 to 21).map(_.toLong).toSet)
    // outside the horizon: loud, not wrong
    intercept[Exception](ids(t, Some(5)))
    // cleanup never strands the table even at retain=0 (clamped to 1)
    SnapshotTable.cleanupLog(spark, t, retainVersions = 0)
    assert(SnapshotTable.currentVersion(spark, t) == 23)
    assert(ids(t) == (1 to 23).map(_.toLong).toSet)
  }

  test("query-shaped end-to-end: a16 aggregate parity with a direct computation") {
    val t = freshTable()
    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    SnapshotTable.commitAppend(spark, t, orders.filter(pmod(col("o_orderkey"), lit(3)) === 0))
    SnapshotTable.commitAppend(spark, t, orders.filter(pmod(col("o_orderkey"), lit(3)) === 1))
    SnapshotTable.commitOverwrite(spark, t, orders.filter(pmod(col("o_orderkey"), lit(3)) === 2))
    val v2 = SnapshotTable.read(spark, t, Some(2)).agg(sum("o_orderkey")).head.getLong(0)
    val direct = orders.filter(pmod(col("o_orderkey"), lit(3)) < 2)
      .agg(sum("o_orderkey")).head.getLong(0)
    assert(v2 == direct)
  }
}

package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import scala.util.Random

/** Randomized differential for the transaction-log table format: seeded
  * random operation sequences (append / overwrite / duplicate-or-fresh
  * stream batch) replayed against a driver-side model; EVERY version's
  * content and every change-feed range must match the model exactly.
  * Checkpoints land inside the sequences (>10 commits), so the replay
  * and the checkpoint path are both under the differential.
  */
class SnapshotPropertySpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_snap_prop").toString + "/t"

  test("random op sequences: every version's content and change feed match a model") {
    val rnd = new Random(20260816L)
    (1 to 3).foreach { round =>
      val t = freshTable()
      // model: per committed version, (content set, inserted set, deleted set)
      var content = Set.empty[Long]
      var versions = Vector.empty[(Set[Long], Set[Long], Set[Long])]
      var nextId = round * 10000L
      var streamBatch = -1L
      val nOps = 14 + rnd.nextInt(6) // crosses the checkpoint interval
      (1 to nOps).foreach { _ =>
        val batch = (0 to rnd.nextInt(3)).map(_ => { nextId += 1; nextId }).toSet
        rnd.nextInt(4) match {
          case 0 => // append
            SnapshotTable.commitAppend(spark, t, batch.toSeq.toDF("id"))
            versions :+= ((content ++ batch, batch, Set.empty[Long]))
            content ++= batch
          case 1 => // overwrite
            SnapshotTable.commitOverwrite(spark, t, batch.toSeq.toDF("id"))
            versions :+= ((batch, batch, content))
            content = batch
          case 2 => // fresh stream batch
            streamBatch += 1
            SnapshotTable.commitStreamBatch(spark, t, batch.toSeq.toDF("id"),
              "prop", streamBatch)
            versions :+= ((content ++ batch, batch, Set.empty[Long]))
            content ++= batch
          case 3 if streamBatch >= 0 => // duplicate stream batch: MUST no-op
            val dupId = rnd.nextInt(streamBatch.toInt + 1).toLong
            val v = SnapshotTable.commitStreamBatch(spark, t,
              Seq(-1L).toDF("id"), "prop", dupId)
            assert(v == versions.size, s"duplicate batch $dupId must not commit")
          case _ => // no stream batch yet: plain append instead
            SnapshotTable.commitAppend(spark, t, batch.toSeq.toDF("id"))
            versions :+= ((content ++ batch, batch, Set.empty[Long]))
            content ++= batch
        }
      }
      assert(SnapshotTable.currentVersion(spark, t) == versions.size)
      // every version's content matches the model (checkpointed and not)
      versions.zipWithIndex.foreach { case ((want, _, _), i) =>
        val got = SnapshotTable.read(spark, t, Some(i + 1))
          .as[Long].collect().toSet
        assert(got == want, s"round $round version ${i + 1}: $got != $want")
      }
      // change feed over random ranges matches the model's per-version sets
      (1 to 5).foreach { _ =>
        val from = rnd.nextInt(versions.size)
        val to = from + 1 + rnd.nextInt(versions.size - from)
        val want = (from until to).flatMap { vi =>
          val (_, ins, del) = versions(vi)
          del.map(id => (id, "delete", vi + 1)) ++ ins.map(id => (id, "insert", vi + 1))
        }.toSet
        val got = SnapshotTable.changes(spark, t, from, to)
          .select("id", "_change_type", "_commit_version")
          .as[(Long, String, Int)].collect().toSet
        assert(got == want, s"round $round changes ($from, $to]: " +
          s"missing ${want -- got}, extra ${got -- want}")
      }
    }
  }

  test("random merge/optimize/delete/overwrite/restore sequences: content, CDF, and fold invariants") {
    val rnd = new Random(20260817L)
    (1 to 2).foreach { round =>
      val t = freshTable()
      // model: id -> v per version. For ops with key-level CDF semantics
      // the exact change set is predicted (Some(set)); RESTORE versions
      // carry file-level diffs (a rewritten-then-restored row may emit a
      // delete+insert pair for identical content), so they are checked by
      // the FOLD INVARIANTS below instead (None) — which are exactly what
      // an incremental ±1 consumer relies on, and what the round-14
      // dv-interplay bugs broke.
      var content = Map.empty[Long, Long]
      var history = Vector.empty[Map[Long, Long]]
      var exact = Vector.empty[Option[Set[(Long, Long, String)]]]
      def record(next: Map[Long, Long],
          want: Option[Set[(Long, Long, String)]]): Unit = {
        history :+= next; exact :+= want; content = next
      }
      var nextId = round * 100000L
      // clone forks taken mid-sequence: (path, expected content at clone
      // time) — verified at the end, including against later source DML
      // (isolation) and with any standing deletion vectors carried
      var clones = Vector.empty[(String, Map[Long, Long])]
      val nOps = 14 + rnd.nextInt(4)
      (1 to nOps).foreach { opIdx =>
        // ~1-in-5 ops also forks a clone (not a table version — no model
        // version recorded; the clone is its own table)
        if (history.nonEmpty && rnd.nextInt(5) == 0) {
          val dst = freshTable()
          SnapshotTable.cloneShallow(spark, t, dst)
          clones :+= ((dst, content))
        }
        rnd.nextInt(7) match {
          case 0 | 1 => // merge: mix of updates (changed + identical) and inserts
            val updates = rnd.shuffle(content.keys.toSeq)
              .take(rnd.nextInt(content.size + 1))
              .map { id =>
                // 1-in-3 no-op update: identical row must be SUPPRESSED
                val v = if (rnd.nextInt(3) == 0) content(id) else rnd.nextLong(1000)
                id -> v
              }
            val inserts = (0 to rnd.nextInt(2)).map(_ => { nextId += 1; nextId -> rnd.nextLong(1000) })
            val src = (updates ++ inserts).toSeq
            if (src.isEmpty) {
              // empty merge source is degenerate; append one row instead
              nextId += 1
              SnapshotTable.commitAppend(spark, t, Seq((nextId, 0L)).toDF("id", "v"))
              record(content + (nextId -> 0L), Some(Set((nextId, 0L, "insert"))))
            } else {
              SnapshotTable.commitMerge(spark, t, src.toDF("id", "v"), Seq("id"))
              val want = src.flatMap { case (id, v) =>
                content.get(id) match {
                  case Some(old) if old == v => Nil // suppressed no-op
                  case Some(old) => Seq((id, old, "update_preimage"), (id, v, "update_postimage"))
                  case None => Seq((id, v, "insert"))
                }
              }.toSet
              record(content ++ src, Some(want))
            }
          case 2 => // append fresh keys
            val batch = (0 to rnd.nextInt(2)).map(_ => { nextId += 1; nextId -> rnd.nextLong(1000) })
            SnapshotTable.commitAppend(spark, t, batch.toDF("id", "v"))
            record(content ++ batch,
              Some(batch.map { case (id, v) => (id, v, "insert") }.toSet))
          case 3 => // optimize: physically rewrites (and purges DVs), logically silent
            val v = SnapshotTable.optimizeCompact(spark, t)
            if (v == history.size + 1)
              record(content, Some(Set.empty[(Long, Long, String)]))
            // else: <2 small files, no commit claimed — no model version
          case 4 if content.nonEmpty => // row-level DELETE of sampled keys:
            // copy-on-write and merge-on-read (deletion vectors) must be
            // indistinguishable to every reader — the model is one
            val victims = rnd.shuffle(content.keys.toSeq)
              .take(1 + rnd.nextInt(2)).toSet
            val pred = org.apache.spark.sql.functions.col("id").isin(victims.toSeq: _*)
            val v = if (rnd.nextBoolean())
              SnapshotTable.commitDelete(spark, t, pred)
            else SnapshotTable.commitDeleteMoR(spark, t, pred)
            assert(v == history.size + 1, "a matching delete must commit")
            record(content -- victims,
              Some(victims.map(id => (id, content(id), "delete"))))
          case 5 => // overwrite: full replacement — deletes are the PRE-version
            // LIVE content (a standing deletion vector must suppress its rows)
            val batch = (0 to rnd.nextInt(2)).map(_ => { nextId += 1; nextId -> rnd.nextLong(1000) })
            SnapshotTable.commitOverwrite(spark, t, batch.toDF("id", "v"))
            record(batch.toMap,
              Some(content.map { case (id, v) => (id, v, "delete") }.toSet ++
                batch.map { case (id, v) => (id, v, "insert") }))
          case 6 if history.nonEmpty => // restore to a random earlier version —
            // the op class the round-14 differential never composed with MoR
            val target = 1 + rnd.nextInt(history.size)
            val v = SnapshotTable.restore(spark, t, target)
            if (v == history.size + 1) record(history(target - 1), None)
            else {
              // content-identical (file set AND dv state): true no-op
              assert(v == history.size, s"restore claimed unexpected version $v")
              assert(history(target - 1) == content,
                "a no-op restore requires identical content")
            }
          case _ => // nothing to delete yet: no-op delete must not commit
            val v = SnapshotTable.commitDelete(spark, t,
              org.apache.spark.sql.functions.col("id") === -1L)
            assert(v == history.size, "a no-match delete must claim no version")
        }
      }
      assert(SnapshotTable.currentVersion(spark, t) == history.size)
      // per-version content matches the model
      history.zipWithIndex.foreach { case (want, i) =>
        val got = SnapshotTable.read(spark, t, Some(i + 1))
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"round $round v${i + 1}: $got != $want")
      }
      // per-version feed: exact sets where predicted; fold invariants ALWAYS
      def feedOf(from: Int, to: Int): Seq[(Long, Long, String, Int)] =
        SnapshotTable.changes(spark, t, from, to)
          .select("id", "v", "_change_type", "_commit_version")
          .as[(Long, Long, String, Int)].collect().toSeq
      val perVersion = (1 to history.size).map(v => feedOf(v - 1, v))
      perVersion.zipWithIndex.foreach { case (feed, i) =>
        val v = i + 1
        val prev = if (v == 1) Map.empty[Long, Long] else history(v - 2)
        val next = history(v - 1)
        exact(i).foreach { want =>
          assert(feed.map(x => (x._1, x._2, x._3)).toSet == want,
            s"round $round v$v exact feed: got ${feed.toSet}, want $want")
        }
        val dels = feed.filter(x => x._3 == "delete" || x._3 == "update_preimage")
        val ins = feed.filter(x => x._3 == "insert" || x._3 == "update_postimage")
        // every delete must name a row LIVE at v-1 (the double-emit bug
        // emitted deletes of already-hidden rows), exactly once
        dels.foreach { case (id, value, _, _) =>
          assert(prev.get(id).contains(value),
            s"round $round v$v: delete of ($id,$value) not live at v-1") }
        assert(dels.map(_._1).distinct.size == dels.size,
          s"round $round v$v: duplicate deletes in $dels")
        // every insert must land in v's content
        ins.foreach { case (id, value, _, _) =>
          assert(next.get(id).contains(value),
            s"round $round v$v: insert of ($id,$value) not in v's content") }
        // the ±1 fold reproduces the version transition exactly
        val folded = prev -- dels.map(_._1) ++ ins.map(x => x._1 -> x._2)
        assert(folded == next, s"round $round v$v fold: $folded != $next")
      }
      // ranged reads must equal the union of single-version feeds — this
      // exercises the range walk's incremental dv-state tracking across
      // restore/overwrite boundaries against fresh per-version resolves
      (1 to 6).foreach { _ =>
        val from = rnd.nextInt(history.size)
        val to = from + 1 + rnd.nextInt(history.size - from)
        val want = ((from + 1) to to).flatMap(v => perVersion(v - 1)).toSet
        val got = feedOf(from, to).toSet
        assert(got == want, s"round $round changes ($from, $to]: " +
          s"missing ${want -- got}, extra ${got -- want}")
      }
      // every mid-sequence clone serves EXACTLY its fork-time content —
      // dv state carried (a MoR-hidden row must not resurrect in the
      // clone), later source DML invisible — and its v1 feed folds to it
      clones.foreach { case (dst, want) =>
        val got = SnapshotTable.read(spark, dst)
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"round $round clone $dst: $got != $want")
        val feed = SnapshotTable.changes(spark, dst, 0, 1)
          .select("id", "v", "_change_type")
          .as[(Long, Long, String)].collect().toSet
        assert(feed == want.map { case (id, v) => (id, v, "insert") }.toSet,
          s"round $round clone feed: $feed != $want")
      }
    }
  }

  test("shallow clone: content identity at clone time, full divergence isolation") {
    val rnd = new Random(77L)
    val base = Files.createTempDirectory("graft_snap_prop_cl").toString
    val (src, dst) = (s"$base/src", s"$base/cl")
    var content = Set.empty[Long]
    (1 to 6).foreach { i =>
      val batch = (1 to 1 + rnd.nextInt(3)).map(_ => rnd.nextLong(1000000)).toSet
      SnapshotTable.commitAppend(spark, src, batch.toSeq.toDF("id"))
      content ++= batch
    }
    SnapshotTable.cloneShallow(spark, src, dst)
    assert(SnapshotTable.read(spark, dst).as[Long].collect().toSet == content)
    // diverge both sides; neither may see the other's writes
    SnapshotTable.commitAppend(spark, src, Seq(-10L).toDF("id"))
    SnapshotTable.commitOverwrite(spark, dst, Seq(-20L).toDF("id"))
    assert(SnapshotTable.read(spark, src).as[Long].collect().toSet == content + -10L)
    assert(SnapshotTable.read(spark, dst).as[Long].collect().toSet == Set(-20L))
    // the clone's v1 time travel still serves the cloned snapshot
    assert(SnapshotTable.read(spark, dst, Some(1)).as[Long].collect().toSet == content)
    // a second clone onto a used table must fail loudly
    intercept[IllegalArgumentException](SnapshotTable.cloneShallow(spark, src, dst))
  }

  test("shallow clone carries deletion vectors: MoR-hidden rows stay hidden in the clone") {
    val base = Files.createTempDirectory("graft_snap_prop_cldv").toString
    val (src, dst) = (s"$base/src", s"$base/cl")
    SnapshotTable.commitAppend(spark, src, Seq(1L, 2L, 3L, 4L).toDF("id").coalesce(1))
    SnapshotTable.commitDeleteMoR(spark, src,
      org.apache.spark.sql.functions.col("id") === 2L)
    SnapshotTable.cloneShallow(spark, dst = dst, src = src)
    // the clone must serve the source's LIVE content, not the raw files —
    // without carried dv state row 2 resurrects (the A20×A26 interplay,
    // same class as the r14 RESTORE bug)
    assert(SnapshotTable.read(spark, dst).as[Long].collect().toSet == Set(1L, 3L, 4L))
    // the clone's v1 change feed inserts are the live rows only
    assert(SnapshotTable.changes(spark, dst, 0, 1)
      .select("id", "_change_type").as[(Long, String)].collect().toSet ==
      Set((1L, "insert"), (3L, "insert"), (4L, "insert")))
    // the clone repays the debt independently: optimize purges ITS vectors
    SnapshotTable.optimizeCompact(spark, dst)
    assert(SnapshotTable.snapshot(spark, dst).dvs.isEmpty)
    assert(SnapshotTable.read(spark, dst).as[Long].collect().toSet == Set(1L, 3L, 4L))
    // ...while the source keeps serving its own dv-applied content
    assert(SnapshotTable.read(spark, src).as[Long].collect().toSet == Set(1L, 3L, 4L))
  }
}

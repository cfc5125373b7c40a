package graft

import org.apache.spark.sql.functions._
import graft.analytics.EventQueries

/** E4 rate-anomaly: driver-side brute force of the trailing-window z-score
  * on sf0.001 — validates the window frame, the n>=12 gate, and the exact
  * integer-sum formulation (not just rows>0 smoke).
  */
class EventAnalyticsSpec extends SparkSpec {

  test("j7_retention_cohorts: week-0 is full, rates bounded, cohorts conserve users") {
    val rows = EventQueries.queries("j7_retention_cohorts")(spark, sfDir)
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (wk, rs) =>
      // a user is active in their own first week by definition
      val w0 = rs.find(_._2 == 0L).getOrElse(fail(s"cohort $wk missing week 0"))
      assert(w0._3 == w0._4 && w0._5 == 1.0, s"cohort $wk week-0 not full")
      rs.foreach { case (_, off, active, size, rate) =>
        assert(off >= 0 && active >= 1 && active <= size)
        assert(rate > 0.0 && rate <= 1.0)
      }
    }
    // cohort sizes partition the user universe
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(byCohort.values.map(_.head._4).sum == users)
  }

  test("e5_sessionize matches a driver-side fold over the per-user event streams") {
    val got = EventQueries.queries("e5_sessionize")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_events"), r.getAs[Long]("duration_s")))
      .sortBy(t => (t._1, t._2)).toSeq

    // independent reference: sort each user's micro-stamps, fold with a
    // 30-minute gap rule
    val byUser = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val want = byUser.toSeq.flatMap { case (u, evs) =>
      val stamps = evs.sortBy(e => (e._3, e._2)).map(_._3)
      val sessions = stamps.tail.foldLeft(List(List(stamps.head))) {
        case (acc @ cur :: rest, t) =>
          if (t - cur.head > 1800L * 1000000L) List(t) :: acc
          else (t :: cur) :: rest
        case (Nil, t) => List(List(t))
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        (u, (i + 1).toLong, s.length.toLong, (s.last - s.head) / 1000000L)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == want, "sessionize must equal the driver-side gap fold")
  }

  test("e6_session_pattern matches a driver-side automaton over per-(user, day) streams") {
    val got = EventQueries.queries("e6_session_pattern")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("day").getTime,
        r.getAs[Long]("n_events"), r.getAs[Long]("n_conversions")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got.nonEmpty, "corpus must contain v->c->p conversions")

    // independent reference: group by (user, utc day), time-order, then
    // the 3-state machine over each day's type sequence
    val rows = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(e => (e._1, math.floorDiv(e._3, 86400L * 1000000L)))
    val want = rows.toSeq.flatMap { case ((u, day), evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      var phase = 0; var conv = 0
      sorted.map(_._4).foreach {
        case "view" if phase == 0 => phase = 1
        case "click" if phase == 1 => phase = 2
        case "purchase" if phase == 2 => conv += 1; phase = 0
        case _ =>
      }
      if (conv >= 1)
        Some((u, day * 86400L * 1000L, sorted.length.toLong, conv.toLong))
      else None
    }.sortBy(t => (t._1, t._2))
    assert(got == want, "pattern counts must equal the driver-side automaton")
  }

  test("e4_anomaly_zscore matches a driver-side trailing-window recount") {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val want = hourly.groupBy(_._1).flatMap { case (tpe, rows) =>
      val sorted = rows.sortBy(_._2.getTime)
      sorted.indices.flatMap { i =>
        val trail = sorted.slice(math.max(0, i - 24), i).map(_._3)
        if (trail.length < 12) None
        else {
          val s = trail.sum
          val s2 = trail.map(c => c * c).sum
          val n = trail.length.toLong
          val mean = s.toDouble / n
          val vari = s2.toDouble / n - mean * mean
          val z = if (vari > 0) Some((sorted(i)._3 - mean) / math.sqrt(vari))
                  else None
          Some((tpe, sorted(i)._2) -> (sorted(i)._3, mean, z))
        }
      }
    }.toMap
    val got = EventQueries.queries("e4_anomaly_zscore")(spark, sfDir)
      .collect()
      .map { r =>
        (r.getString(0), r.getTimestamp(1)) ->
          (r.getLong(2), r.getDouble(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)))
      }.toMap
    assert(got.keySet == want.keySet, "row set (frame + n>=12 gate)")
    want.foreach { case (k, (cnt, mean, z)) =>
      val (gc, gm, gz) = got(k)
      assert(gc == cnt, s"$k cnt")
      assert(math.abs(gm - mean) < 1e-6, s"$k mean")
      (gz, z) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-6, s"$k z")
        case (None, None)       =>
        case other              => fail(s"$k z null mismatch: $other")
      }
    }
    // the interesting rows exist: at least one |z| > 2 or the data is
    // suspiciously flat — and the gate dropped the first 12 hours
    assert(want.nonEmpty)
  }

  test("d12_resample_ffill: dense grid, real gaps, fill carries the last observation") {
    val rows = graft.SparkEntry.queries("d12_resample_ffill")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byType = rows.groupBy(_._1)
    byType.values.foreach { tr =>
      val slots = tr.map(_._2).sorted
      // dense, regular, shared grid
      assert(slots.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == 900),
        "grid must be a dense 900s lattice")
      // forward fill: a gap row carries exactly the previous row's value
      tr.sortBy(_._2).foldLeft(0L) { case (prev, (_, _, v, gap)) =>
        if (gap) assert(v == prev, s"gap filled $v, expected carry $prev")
        v
      }
    }
    // the sparse corpus really exercises the fill path
    assert(rows.exists(_._4), "expected at least one gap at sf0.001")
    assert(byType.keySet.size >= 3)
  }
}

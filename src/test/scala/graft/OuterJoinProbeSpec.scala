package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Pins the left-outer stream-stream join emission rules the
  * `j11_stream_outer_join` oracle encodes:
  *  - a matched pair emits when the later side arrives (no watermark
  *    needed);
  *  - an unmatched left row null-emits iff the watermark STRICTLY
  *    exceeds its event time (wm == lts does NOT emit);
  *  - rows above the final watermark stay in state and never emit.
  * If a Spark upgrade changed any boundary, these go red before the
  * oracle silently diverges.
  */
class OuterJoinProbeSpec extends SparkSpec {
  private def ts(s: Long) = new Timestamp(s * 1000)

  test("probe: left-outer stream-stream join null emission") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val L = MemoryStream[(String, Timestamp)]
    val R = MemoryStream[(String, Timestamp)]
    val l = L.toDF().toDF("k", "lts").withWatermark("lts", "10 minutes")
    val r = R.toDF().toDF("rk", "rts").withWatermark("rts", "10 minutes")
    val j = l.join(r,
      col("k") === col("rk") &&
        col("rts") >= col("lts") - expr("INTERVAL 5 minutes") &&
        col("rts") <= col("lts"),
      "left_outer")
    val q = j.writeStream.format("memory").queryName("ojprobe")
      .outputMode(OutputMode.Append).start()
    def dump(tag: String): Unit = {
      q.processAllAvailable()
      val rows = spark.table("ojprobe").collect()
        .map(x => (x.getString(0), x.getTimestamp(1).getTime/1000,
          Option(x.getString(2)),
          Option(x.getTimestamp(3)).map(_.getTime/1000))).toSet
      println(s"[ojprobe] $tag -> $rows")
    }
    // b1: one matched pair and one unmatched left at t=600
    L.addData(("m", ts(600)), ("u", ts(600)))
    R.addData(("m", ts(590)))
    dump("b1 (wm=0)")
    // b2: advance both sides' event time to 3600 -> wm = 3000
    // u's max-match bound is 600; 3000 > 600 -> should null-emit if the
    // rule is wm > lts (state watermark on the left side)
    L.addData(("adv", ts(3600)))
    R.addData(("advr", ts(3600)))
    dump("b2 (wm=3000)")
    // b3: push wm to 6600
    L.addData(("adv2", ts(7200)))
    R.addData(("advr2", ts(7200)))
    dump("b3 (wm=6600)")
    val fin = spark.table("ojprobe").collect()
      .map(x => (x.getString(0), Option(x.getString(2)))).toSet
    assert(fin.contains(("m", Some("m"))), "matched pair must emit")
    assert(fin.contains(("u", None)), "unmatched left must null-emit once wm > lts")
    assert(fin.contains(("adv", None)), "wm 6600 > 3600 must flush adv")
    assert(!fin.exists(_._1 == "adv2"), "rows above the final wm never emit")
    q.stop()
  }

  test("probe: null-emission boundary at wm == lts exactly") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val L = MemoryStream[(String, Timestamp)]
    val R = MemoryStream[(String, Timestamp)]
    val l = L.toDF().toDF("k", "lts").withWatermark("lts", "10 minutes")
    val r = R.toDF().toDF("rk", "rts").withWatermark("rts", "10 minutes")
    val j = l.join(r,
      col("k") === col("rk") &&
        col("rts") >= col("lts") - expr("INTERVAL 5 minutes") &&
        col("rts") <= col("lts"),
      "left_outer")
    val q = j.writeStream.format("memory").queryName("ojprobe2")
      .outputMode(OutputMode.Append).start()
    // u@600; advance both sides to exactly 1200 -> wm = 1200 - 600 = 600 == lts
    L.addData(("u", ts(600)))
    R.addData(("seed", ts(0)))
    q.processAllAvailable()
    L.addData(("adv", ts(1200)))
    R.addData(("advr", ts(1200)))
    q.processAllAvailable()
    val atEq = spark.table("ojprobe2").collect().map(_.getString(0)).toSet
    assert(!atEq.contains("u"), "wm == lts must NOT null-emit (strict boundary)")
    // then strictly past it
    L.addData(("adv2", ts(2400)))
    R.addData(("advr2", ts(2400)))
    q.processAllAvailable()
    val past = spark.table("ojprobe2").collect().map(_.getString(0)).toSet
    assert(past.contains("u"), "wm > lts must null-emit")
    q.stop()
  }
}

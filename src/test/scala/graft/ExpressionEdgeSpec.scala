package graft

import graft.functions.VectorExpressions._
import org.apache.spark.sql.functions._

/** Edge inputs through the native expressions: empty docs/arrays must be
  * well-defined, not crash or diverge from the HOF formulations.
  */
class ExpressionEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("shinglesFast on empty and single-token docs degrades to whole-doc shingle") {
    val out = Seq("", "solo", "a b").toDF("text")
      .select(col("text"), shinglesFast(split(col("text"), " "), 3).as("sh"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("") == Seq(""))
    assert(out("solo") == Seq("solo"))
    assert(out("a b") == Seq("a b"))
  }

  test("minHashFast on empty shingle set returns all-MaxValue signature (no elements to min)") {
    val sig = Seq(1).toDF("x")
      .select(minHashFast(array().cast("array<string>"), 8).as("s"))
      .as[Seq[Long]].head()
    assert(sig == Seq.fill(8)(Long.MaxValue))
  }

  test("simHashFast on empty token set is deterministic (all-votes-zero fingerprint)") {
    val fps = Seq(1, 2).toDF("x")
      .select(simHashFast(array().cast("array<string>")).as("f"))
      .as[Long].collect().toSeq
    assert(fps.distinct.size == 1)
  }

  test("nearestCentroid yields NULL for a dimension-mismatched vector, not a truncated guess") {
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val out = Seq(
      (1L, Seq(0.9, 0.1)),     // well-formed → cell 0
      (2L, Seq(0.9)),          // too short → NULL
      (3L, Seq(0.1, 0.9, 7.0)) // too long → NULL
    ).toDF("id", "v")
      .select(col("id"), nearestCentroid(col("v"), centroids).as("cell"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(out(1L) == Some(0))
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("rollingChunks on empty and short strings yields exactly one chunk") {
    val out = Seq("", "tiny").toDF("t")
      .select(col("t"), rollingChunks(col("t")).as("c"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out("").length == 1 && out("tiny").length == 1)
  }

  test("dotFast on empty arrays is 0") {
    val v = Seq(1).toDF("x")
      .select(dotFast(array().cast("array<double>"), array().cast("array<double>")))
      .as[Double].head()
    assert(v == 0.0)
  }

  test("quantizeInt8Stats: zero/empty vectors yield (null scale, 0 error); normal vectors bound error by 0.5/scale") {
    val rows = Seq(
      (1L, Seq.empty[Double]),
      (2L, Seq(0.0, 0.0)),
      (3L, Seq(1.0, -2.0, 0.5)),
      (4L, Seq(-127.0)),
      (5L, Seq(1e-9, -3e-9)))
      .toDF("id", "v")
      .select($"id", quantizeInt8Stats($"v").as("st"))
      .select($"id", $"st.scale", $"st.max_err")
      .as[(Long, Option[Double], Double)].collect()
      .map { case (k, s, e) => k -> ((s, e)) }.toMap
    assert(rows(1L) == ((None, 0.0)), "empty vector")
    assert(rows(2L) == ((None, 0.0)), "all-zero vector")
    val s3 = rows(3L)._1.get
    assert(s3 == 127.0 / 2.0 && rows(3L)._2 <= 0.5 / s3 + 1e-15, s"got ${rows(3L)}")
    assert(rows(4L)._1.contains(1.0) && rows(4L)._2 == 0.0,
      "max-abs element quantizes exactly")
    val s5 = rows(5L)._1.get
    assert(rows(5L)._2 <= 0.5 / s5 + 1e-24, "tiny magnitudes stay bounded")
  }
}

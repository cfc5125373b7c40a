package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum: bit-parity with the naive single-partition
  * window across bucket counts (including degenerate ones), the returned
  * total, and the plan shape that is the operator's whole point — no
  * `Exchange SinglePartition` anywhere in the cumsum subtree.
  */
class PrefixSumSpec extends SparkSpec {

  private def toks = Tables.documents(spark, sfDir)
    .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("v"))

  private def naive = toks.withColumn("cum",
    sum("v").over(Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    .select("doc_id", "cum").collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("globalCumsum matches the single-partition window bit-for-bit") {
    val want = naive
    for (buckets <- Seq(1, 4, 32, 1000)) {
      val got = PrefixSum.globalCumsum(toks, "doc_id", "v", buckets)
        .select("doc_id", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"buckets=$buckets diverged from the naive window")
    }
  }

  test("globalCumsumAndTotal returns the corpus total") {
    val (_, total) = PrefixSum.globalCumsumAndTotal(toks, "doc_id", "v", 8)
    val want = toks.agg(sum("v")).collect()(0).getLong(0)
    assert(total == want)
  }

  test("cumsum plan has no single-partition exchange; window is per-bucket") {
    val plan = PrefixSum.globalCumsum(toks, "doc_id", "v", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"global cumsum regressed to the single-partition funnel:\n$plan")
    assert(plan.contains("hashpartitioning(_bkt"),
      s"expected the bucket-keyed window exchange:\n$plan")
  }

  test("two-stage salted posting top-k equals the single-stage ranking under a hot term") {
    import spark.implicits._
    // one stopword in every doc (hot posting set), unique terms elsewhere;
    // tf ties everywhere so the doc_id tiebreak is load-bearing
    val tf = (0L until 200L).flatMap(d =>
        Seq(("the", d, 1L + d % 3), (s"rare$d", d, 1L)))
      .toDF("term", "doc_id", "tf")
    val w1 = Window.partitionBy(col("term"), pmod(col("doc_id"), lit(16)))
      .orderBy(col("tf").desc, col("doc_id"))
    val w2 = Window.partitionBy("term").orderBy(col("tf").desc, col("doc_id"))
    val staged = tf
      .withColumn("_r1", row_number().over(w1)).filter(col("_r1") <= 16)
      .withColumn("_r2", row_number().over(w2)).filter(col("_r2") <= 16)
      .select("term", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val single = tf
      .withColumn("_r", row_number().over(w2)).filter(col("_r") <= 16)
      .select("term", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(staged == single, "salted two-stage top-k must equal single-stage top-k")
    assert(staged.count(_._1 == "the") == 16, "hot term must cap at 16 postings")
  }
}

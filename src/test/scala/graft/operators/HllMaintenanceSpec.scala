package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental HLL maintenance: folded-union accuracy vs exact counts,
  * replay no-op, shape-mismatch loudness.
  */
class HllMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val lgK = 12

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("hllstate").toString

  private def corpus() = {
    val rnd = new scala.util.Random(31L)
    // 20k rows over ~6k distinct keys
    (1 to 20000).map(i => (i.toLong, s"u${rnd.nextInt(6000)}"))
      .toDF("id", "k")
  }

  test("folded batch unions estimate within 3*rse of the exact distinct count") {
    val c = corpus()
    val exact = c.select(countDistinct(col("k"))).head().getLong(0)
    val path = freshDir()
    (0 until 4).foreach { b =>
      HllMaintenance.update(spark, path,
        c.filter(pmod(col("id"), lit(4)) === b), col("k"), lgK, Some(b.toLong))
    }
    val (storedLgK, sketch) = HllMaintenance.read(spark, path).get
    assert(storedLgK == lgK)
    val est = HllMaintenance.estimate(spark, sketch)
    val tol = math.ceil(exact * 3 * 1.04 / math.sqrt(1 << lgK)).toLong
    assert(math.abs(est - exact) <= tol,
      s"folded estimate $est vs exact $exact outside 3*rse tolerance $tol")
  }

  test("replayed batchId is a no-op returning the committed bytes") {
    val c = corpus()
    val path = freshDir()
    HllMaintenance.update(spark, path, c.filter(col("id") <= 10000),
      col("k"), lgK, Some(0L))
    val merged = HllMaintenance.update(spark, path, c.filter(col("id") > 10000),
      col("k"), lgK, Some(1L))
    val replay = HllMaintenance.update(spark, path, c.filter(col("id") > 10000),
      col("k"), lgK, Some(1L))
    assert(java.util.Arrays.equals(merged, replay),
      "replay must return the committed sketch unchanged")
  }

  test("lgK mismatch with stored state fails loudly") {
    val c = corpus()
    val path = freshDir()
    HllMaintenance.update(spark, path, c, col("k"), lgK, Some(0L))
    val e = intercept[IllegalArgumentException] {
      HllMaintenance.update(spark, path, c, col("k"), lgK + 1, Some(1L))
    }
    assert(e.getMessage.contains("shape mismatch"))
    // the replay path enforces the same contract
    val e2 = intercept[IllegalArgumentException] {
      HllMaintenance.update(spark, path, c, col("k"), lgK + 1, Some(0L))
    }
    assert(e2.getMessage.contains("shape mismatch"))
  }

  test("declared d9_hll_incremental: single verdict row, both booleans true") {
    val rows = graft.SparkEntry.queries("d9_hll_incremental")(spark, sfDir)
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getBoolean(2), "estimate outside the rse band")
    assert(rows.head.getBoolean(3), "replay was not stable")
    // the emitted estimate is the band's own witness (round-11: realized
    // values ride the output so a breach is diagnosable)
    assert(math.abs(rows.head.getLong(1) - rows.head.getLong(0)) <=
      math.ceil(rows.head.getLong(0) * 0.05).toLong)
  }

  test("declared d11_hll_rollup: per-type verdicts true, union row correct, rollup beats naive sum") {
    val rows = graft.SparkEntry.queries("d11_hll_rollup")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.count(_._1 == "_ALL") == 1)
    assert(rows.forall(_._3), s"a sketch drifted outside its band: $rows")
    val all = rows.find(_._1 == "_ALL").get._2
    val naiveSum = rows.filter(_._1 != "_ALL").map(_._2).sum
    // users appear under many event types: the naive per-type sum
    // overcounts heavily, the sketch union must not — that gap is the
    // reason the rollup pattern exists
    assert(naiveSum > all, "corpus should have cross-type user overlap")
  }
}

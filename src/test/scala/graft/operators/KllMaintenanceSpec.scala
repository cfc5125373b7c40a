package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental KLL quantile maintenance: folded-merge rank accuracy vs
  * exact ranks, replay no-op, shape-mismatch loudness, declared verdicts.
  */
class KllMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val k = 200

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("kllstate").toString

  private def corpus() = {
    val rnd = new scala.util.Random(47L)
    // 20k skewed doubles (lognormal-ish): quantiles spread over decades
    (1 to 20000).map(i => (i.toLong, math.exp(rnd.nextGaussian() * 2.0)))
      .toDF("id", "v")
  }

  test("folded batch merges put every quantile estimate within the rank bound") {
    val c = corpus()
    val path = freshDir()
    (0 until 4).foreach { b =>
      KllMaintenance.update(spark, path,
        c.filter(pmod(col("id"), lit(4)) === b), col("v"), k, Some(b.toLong))
    }
    val (storedK, sketch) = KllMaintenance.read(spark, path).get
    assert(storedK == k)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val ests = KllMaintenance.quantiles(sketch, qs)
    val n = c.count().toDouble
    qs.zip(ests).foreach { case (q, est) =>
      val rank = c.filter(col("v") <= est).count() / n
      // normalized rank error at k=200 is ~1.65%; 0.05 is the 3x band
      assert(math.abs(rank - q) <= 0.05,
        s"q=$q est=$est realized rank $rank outside the band")
    }
    // monotone: estimates must be nondecreasing in q
    assert(ests == ests.sorted, s"non-monotone quantiles: $ests")
  }

  test("partition-count sweep: tree and flat merges honor the same rank bound") {
    val c = corpus().cache()
    val n = c.count().toDouble
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    // 1 and 8 take the flat path; 256 exercises the two-level tree
    // (16 executor-side group merges of 16 partials, 16 on the driver)
    val layouts = Seq(1, 8, 256)
    assert(layouts.exists(_ > KllMaintenance.flatMergeMaxPartitions))
    layouts.foreach { p =>
      val sketch = KllMaintenance.batchSketch(c.repartition(p), col("v"), k)
      KllMaintenance.quantiles(sketch, qs).zip(qs).foreach { case (est, q) =>
        val rank = c.filter(col("v") <= est).count() / n
        assert(math.abs(rank - q) <= 0.05,
          s"partitions=$p q=$q est=$est realized rank $rank outside the band")
      }
    }
    // bytes are NOT asserted equal: KLL compaction is randomized
    // (measured — even two identical sequential builds differ), so the
    // stable contract across merge topologies is the rank bound above
    c.unpersist()
  }

  test("replayed batchId is a no-op returning the committed bytes") {
    val c = corpus()
    val path = freshDir()
    KllMaintenance.update(spark, path, c.filter(col("id") <= 10000),
      col("v"), k, Some(0L))
    val merged = KllMaintenance.update(spark, path, c.filter(col("id") > 10000),
      col("v"), k, Some(1L))
    val replay = KllMaintenance.update(spark, path, c.filter(col("id") > 10000),
      col("v"), k, Some(1L))
    assert(java.util.Arrays.equals(merged, replay),
      "replay must return the committed sketch unchanged")
  }

  test("k mismatch with stored state fails loudly") {
    val c = corpus()
    val path = freshDir()
    KllMaintenance.update(spark, path, c, col("v"), k, Some(0L))
    val e = intercept[IllegalArgumentException] {
      KllMaintenance.update(spark, path, c, col("v"), k + 8, Some(1L))
    }
    assert(e.getMessage.contains("shape mismatch"))
  }

  test("declared d10_kll_quantiles: five rows, all verdicts true") {
    val rows = graft.SparkEntry.queries("d10_kll_quantiles")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getBoolean(3),
        s"q=${r.getDouble(0)} realized rank ${r.getDouble(2)} outside the band")
      assert(r.getBoolean(4), "replay was not stable")
    }
  }
}

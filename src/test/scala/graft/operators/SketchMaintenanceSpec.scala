package graft.operators

import graft.SparkSpec
import graft.functions.CountMinAggregator
import org.apache.spark.sql.functions._

/** Incremental Count-Min maintenance: fold-equals-one-shot exactness,
  * replay no-op, crash-leftover sweep, shape-mismatch loudness.
  */
class SketchMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 128

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("cmstate").toString

  private def corpus() = {
    val rnd = new scala.util.Random(17L)
    (1 to 3000).map(i => (i.toLong, s"w${rnd.nextInt(400)}"))
      .toDF("id", "k")
  }

  test("folded batches equal the one-shot sketch exactly, any split") {
    val c = corpus()
    val oneShot = SketchMaintenance.batchPartial(c, col("k"), depth, width)
    val path = freshDir()
    (0 until 4).foreach { b =>
      SketchMaintenance.update(spark, path,
        c.filter(pmod(col("id"), lit(4)) === b), col("k"), depth, width,
        batchId = Some(b.toLong))
    }
    val (d, w, folded) = SketchMaintenance.read(spark, path).get
    assert((d, w) == (depth, width))
    assert(folded.toSeq == oneShot.toSeq,
      "CM fold must be EXACTLY the one-shot sketch (pointwise-add merge)")
  }

  test("replayed batchId is a no-op: counts cannot double") {
    val c = corpus()
    val path = freshDir()
    val b0 = c.filter(col("id") <= 1500)
    val b1 = c.filter(col("id") > 1500)
    SketchMaintenance.update(spark, path, b0, col("k"), depth, width, Some(0L))
    SketchMaintenance.update(spark, path, b1, col("k"), depth, width, Some(1L))
    val after = SketchMaintenance.update(spark, path, b1, col("k"),
      depth, width, Some(1L)) // replay
    val oneShot = SketchMaintenance.batchPartial(c, col("k"), depth, width)
    assert(after.toSeq == oneShot.toSeq, "replay must not double-count")
    assert(after.sum == 3000L * depth, "total mass = N per row")
  }

  test("uncommitted crash leftovers are swept; committed state survives") {
    val c = corpus()
    val path = freshDir()
    SketchMaintenance.update(spark, path, c, col("k"), depth, width, Some(0L))
    // simulate a crashed refresh: a version dir without _SUCCESS
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/v99_b7"))
    val (_, _, counters) = SketchMaintenance.read(spark, path).get
    val oneShot = SketchMaintenance.batchPartial(c, col("k"), depth, width)
    assert(counters.toSeq == oneShot.toSeq)
    // next refresh sweeps the leftover and still folds correctly
    val merged = SketchMaintenance.update(spark, path, c, col("k"),
      depth, width, Some(1L))
    assert(merged.sum == 2 * 3000L * depth)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/v99_b7")),
      "crashed leftover must be swept")
  }

  test("depth/width mismatch with stored state fails loudly") {
    val c = corpus()
    val path = freshDir()
    SketchMaintenance.update(spark, path, c, col("k"), depth, width, Some(0L))
    val e = intercept[IllegalArgumentException] {
      SketchMaintenance.update(spark, path, c, col("k"), depth, width * 2,
        Some(1L))
    }
    assert(e.getMessage.contains("shape mismatch"))
    // the REPLAY path must enforce the same contract — returning the
    // stored counters to a caller that will index them with the wrong
    // geometry is the silent corruption the check exists to prevent
    val e2 = intercept[IllegalArgumentException] {
      SketchMaintenance.update(spark, path, c, col("k"), depth, width * 2,
        Some(0L)) // same batchId as the committed version
    }
    assert(e2.getMessage.contains("shape mismatch"))
  }

  test("null keys are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("k")
    val sk = SketchMaintenance.batchPartial(df, col("k"), depth, width)
    assert(sk.sum == 2L * depth)
    assert(CountMinAggregator.estimate(sk.toIndexedSeq, "a", depth, width) == 2L)
  }
}

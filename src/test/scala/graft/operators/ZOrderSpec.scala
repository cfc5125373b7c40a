package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkSpec

/** Z-order layout: curve arithmetic vs a driver-side reference, and the
  * property the operator exists for — a z-ordered layout lets the parquet
  * reader skip row groups for box predicates on EITHER dimension, where a
  * single-column sort only skips on its own column.
  */
class ZOrderSpec extends SparkSpec {

  private def refZ(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until ZOrder.DimBits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("curve matches a driver-side reference interleave") {
    val n = 4096L
    val df = spark.range(n).select(
      (col("id") * 37 % 1000).as("x"), (col("id") * 101 % 1000).as("y"))
    val got = df.select(col("x"), col("y"),
        ZOrder.curve(Seq((col("x"), 0L, 999L), (col("y"), 0L, 999L))).as("z"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      val qx = math.floor(x * 65535.0 / 999).toLong
      val qy = math.floor(y * 65535.0 / 999).toLong
      assert(r.getLong(2) == refZ(qx, qy), s"z($x,$y)")
    }
  }

  test("quantize clamps out-of-bounds values to curve endpoints") {
    val df = spark.range(1).select(lit(-5L).as("lo"), lit(500L).as("hi"))
    val r = df.select(ZOrder.quantize(col("lo"), 0L, 100L),
      ZOrder.quantize(col("hi"), 0L, 100L)).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 65535L)
  }

  private def scanRows(path: String, filter: org.apache.spark.sql.Column): (Long, Long) = {
    val df = spark.read.parquet(path).filter(filter)
    // collect through df's OWN queryExecution — count() would build a
    // separate plan and leave these metrics untouched
    val matched = df.collect().length.toLong
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    (scan.metrics("numOutputRows").value, matched)
  }

  test("z-ordered layout skips row groups on both dims; 1-dim sort does not") {
    // independent grid: x cycles 0..999, y steps every 1000 rows — a
    // linear-congruential y would be correlated with x mod 1000 and the
    // box could be empty
    val n = 200000L
    val data = spark.range(n).select(col("id"),
        (col("id") % 1000).as("x"), expr("id DIV 1000").as("y"))
      .localCheckpoint(true)
    val base = Files.createTempDirectory("zorder").toString
    // layout A: sorted by x only (16 files = 16 row groups)
    data.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$base/by_x")
    // layout B: z-ordered on (x, y)
    ZOrder.writeLayout(data, Seq("x", "y"), s"$base/zorder", files = 16)
    val box = col("x").between(100, 150) && col("y").between(40, 90)
    val (xScan, xMatch) = scanRows(s"$base/by_x", box)
    val (zScan, zMatch) = scanRows(s"$base/zorder", box)
    // identical result set
    assert(xMatch == zMatch && zMatch > 0)
    // both layouts prune the box query well below a full scan (the x-sort
    // via its x stripe — on an x-selective box the two can tie; the
    // z-order's edge is the y-only case below)
    assert(xScan < n / 4, s"x-sort scan $xScan reads too much of $n")
    assert(zScan < n / 4, s"z-order scan $zScan reads too much of $n")
    // a y-only predicate: the x-sort gives parquet nothing to skip with
    // (every file spans all y), the z-order still prunes
    val yOnly = col("y").between(40, 60)
    val (xyScan, xyMatch) = scanRows(s"$base/by_x", yOnly)
    val (zyScan, zyMatch) = scanRows(s"$base/zorder", yOnly)
    assert(xyMatch == zyMatch && zyMatch > 0)
    assert(zyScan < xyScan, s"y-only: z-order $zyScan !< x-sort $xyScan")
  }
}

package graft

import graft.functions.HeavyHittersAggregator
import scala.util.Random

/** Misra–Gries heavy-hitters sketch: the ε = 1/capacity guarantee against
  * exact counts, exercised through Spark's real partial+final aggregation
  * path (many input partitions → many sketch merges).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("every key above N/capacity survives; estimates within [f - N/cap, f]") {
    val rnd = new Random(99L)
    val capacity = 32
    // 6 planted hitters at ~8% each + long uniform tail of 2000 rare keys
    val planted = (1 to 6).map(i => s"hot$i")
    val stream = rnd.shuffle(
      planted.flatMap(w => Seq.fill(800)(w)) ++
        (1 to 5200).map(_ => s"cold${rnd.nextInt(2000)}"))
    val n = stream.length.toLong
    val exact: Map[String, Long] =
      stream.groupBy(identity).view.mapValues(_.length.toLong).toMap

    val ds = stream.toDS().repartition(16) // force real sketch merges
    val sketch = ds.select(new HeavyHittersAggregator(capacity).toColumn)
      .head().toMap

    assert(sketch.size <= capacity, s"state exceeded capacity: ${sketch.size}")
    planted.foreach { w =>
      assert(sketch.contains(w), s"guaranteed hitter $w missing (f=${exact(w)})")
    }
    sketch.foreach { case (k, est) =>
      val f = exact(k)
      assert(est <= f, s"$k overcounted: est=$est > f=$f")
      assert(est >= f - n / capacity,
        s"$k undercounted beyond the bound: est=$est, f=$f, N/cap=${n / capacity}")
    }
  }

  test("declared k4_heavy_hitters query: every true hitter kept by the sketch, estimates inside the MG band") {
    // verdict shape (since the guarantee oracle landed): one row per TRUE
    // heavy hitter (exact_count · 256 > N), with the sketch's keep/band
    // verdicts as booleans — the oracle asserts both columns all-true
    val df = SparkEntry.queries("k4_heavy_hitters")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty, "sf0.001 corpus must have words above N/256")
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "rows must be ordered by exact_count desc")
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"guaranteed hitter ${r.getString(0)} missing from the sketch")
      assert(r.getBoolean(3),
        s"estimate for ${r.getString(0)} outside [f - N/256, f]")
    }
    // the single most frequent word is far above the error band, so the
    // top verdict row must be the exact #1 word
    val exactTop = SparkEntry.queries("k4_word_counts")(spark, sfDir)
      .head().getString(0)
    assert(rows.head.getString(0) == exactTop,
      s"top hitter=${rows.head.getString(0)} exact top=$exactTop")
  }

  test("Count-Min: est >= f for EVERY key, band holds for hitters, merge-order invariant") {
    import graft.functions.CountMinAggregator
    val rnd = new Random(7L)
    val depth = 4
    val width = 256
    val planted = (1 to 6).map(i => s"hot$i")
    val stream = rnd.shuffle(
      planted.flatMap(w => Seq.fill(700)(w)) ++
        (1 to 4000).map(_ => s"cold${rnd.nextInt(1500)}"))
    val n = stream.length.toLong
    val exact: Map[String, Long] =
      stream.groupBy(identity).view.mapValues(_.length.toLong).toMap

    def sketchOf(parts: Int): IndexedSeq[Long] =
      stream.toDS().repartition(parts)
        .select(new CountMinAggregator(depth, width).toColumn)
        .head().toIndexedSeq

    val sk16 = sketchOf(16)
    // pointwise-add merge ⇒ the sketch is IDENTICAL at any parallelism
    assert(sk16 == sketchOf(3),
      "CM sketch must be merge-order/partitioning invariant")
    assert(sk16.sum == n * depth, "each row must hold total mass N")

    exact.foreach { case (k, f) =>
      val est = CountMinAggregator.estimate(sk16, k, depth, width)
      assert(est >= f, s"$k undercounted: est=$est < f=$f — impossible for CM")
    }
    val band = math.ceil(math.E / width * n).toLong
    planted.foreach { k =>
      val est = CountMinAggregator.estimate(sk16, k, depth, width)
      assert(est <= exact(k) + band,
        s"$k drifted outside the εN band: est=$est f=${exact(k)} band=$band")
    }
  }

  test("declared k4_countmin query: both verdict columns all-true on the corpus") {
    val rows = SparkEntry.queries("k4_countmin")(spark, sfDir).collect()
    assert(rows.length == 20, "top-20 probe keys expected")
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} under-counted")
      assert(r.getBoolean(4), s"${r.getString(0)} outside the εN band")
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: emitted est below exact count")
    }
  }
}

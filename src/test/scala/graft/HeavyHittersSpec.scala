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

  test("declared k4_heavy_hitters query: stable 20-row shape, ranks 1..20, top word agrees with exact counts") {
    val df = SparkEntry.queries("k4_heavy_hitters")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 20, s"expected exactly 20 rows, got ${rows.length}")
    assert(rows.map(_.getInt(0)).toSeq == (1 to 20), "ranks must be 1..20")
    // the single most frequent word is far above the error band at any
    // capacity ≥ 64, so the sketch's #1 must equal the exact #1
    val exactTop = SparkEntry.queries("k4_word_counts")(spark, sfDir)
      .head().getString(0)
    assert(rows.head.getString(1) == exactTop,
      s"sketch top=${rows.head.getString(1)} exact top=$exactTop")
  }
}

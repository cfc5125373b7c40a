package graft.operators

import graft.SparkSpec
import graft.analytics.SimilarityQueries

/** K3 JL random projection: matrix determinism, the JL distance band on
  * the real corpus, and the declared query's shape.
  */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("rademacher matrix is the documented md5 coin, stable across calls") {
    val m1 = RandomProjection.rademacher(64, 16)
    val m2 = RandomProjection.rademacher(64, 16)
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    assert(m1.length === 16 && m1.forall(_.length === 64))
    assert(m1.flatten.forall(s => s == 1.0 || s == -1.0))
    // md5('rp:0,0') = fbf2… → nibble 0xf ≥ 8 → −1 (cross-checked against
    // DuckDB's md5 during oracle design)
    assert(m1(0)(0) === -1.0)
    // a fair-ish coin: both signs well represented over 1024 entries
    val pos = m1.flatten.count(_ == 1.0)
    assert(pos > 350 && pos < 674, s"suspicious sign balance: $pos/1024")
  }

  test("projection preserves distances within the JL band on the corpus") {
    val out = SimilarityQueries.queries("k3_random_projection")(spark, sfDir)
      .select("ratio").as[Double].collect()
    assert(out.length > 100)
    // 16 dims → ε is wide, but ratios concentrate near 1: no collapse
    // (ratio ≈ 0) and no blowup; the mean is an unbiased-ish estimate.
    assert(out.forall(r => r > 0.3 && r < 2.0),
      s"ratio outside sane JL band: min=${out.min} max=${out.max}")
    val mean = out.sum / out.length
    assert(math.abs(mean - 1.0) < 0.15, s"mean ratio drifted: $mean")
  }

  test("projected space is stable: same vector projects identically via column path") {
    val signs = RandomProjection.rademacher(64, 16)
    val v = Array.tabulate(64)(i => (i % 7).toDouble - 3.0)
    val df = Seq((1L, v.toSeq)).toDF("id", "v")
    val y = df.select(RandomProjection.project(
        org.apache.spark.sql.functions.col("v"), signs).as("y"))
      .as[Seq[Double]].head()
    val expected = signs.map(row => row.zip(v).map { case (s, x) => s * x }.sum)
    assert(y.toArray.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }
}

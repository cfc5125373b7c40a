package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** I2: vector math built from codegen'd higher-order functions. */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).as[Double].head()

  private val a = array(lit(1.0), lit(2.0), lit(3.0))
  private val b = array(lit(4.0), lit(-5.0), lit(6.0))

  test("dot product") { assert(one(dot(a, b)) == 1.0 * 4 - 2 * 5 + 3 * 6) }

  test("l2 norm") { assert(math.abs(one(l2Norm(a)) - math.sqrt(14)) < 1e-12) }

  test("cosine of identical vectors is 1") {
    assert(math.abs(one(cosine(a, a)) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    val x = array(lit(1.0), lit(0.0)); val y = array(lit(0.0), lit(1.0))
    assert(one(cosine(x, y)) == 0.0)
  }

  test("l2 distance") {
    assert(math.abs(one(l2Distance(a, b)) - math.sqrt(9 + 49 + 9)) < 1e-12)
  }

  test("shingles: n-grams of tokens, distinct; short docs degrade to whole-doc shingle") {
    val toks = split(lit("a b c d"), " ")
    val sh = Seq(1).toDF("x").select(shingles(toks, 2).as("s"))
      .as[Seq[String]].head()
    assert(sh.toSet == Set("a b", "b c", "c d"))
    val short = Seq(1).toDF("x")
      .select(shingles(split(lit("a b"), " "), 3).as("s")).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("jaccard of half-overlapping sets") {
    val s1 = array(lit("a"), lit("b")); val s2 = array(lit("b"), lit("c"))
    assert(one(jaccard(s1, s2)) == 1.0 / 3.0)
  }

  test("minhash signature of identical shingle sets is identical; length k") {
    val sh1 = shingles(split(lit("w x y z"), " "), 2)
    val df = Seq(1).toDF("t").select(
      minHashSignature(sh1, 16).as("s1"), minHashSignature(sh1, 16).as("s2"))
    val (s1, s2) = df.as[(Seq[Long], Seq[Long])].head()
    assert(s1 == s2 && s1.length == 16)
  }
}

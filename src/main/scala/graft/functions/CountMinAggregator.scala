package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** I3/K4: Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
  * as a typed mergeable Aggregator — point-frequency estimates over an
  * unbounded key space in ONE pass with FIXED memory, the complement of
  * the Misra–Gries summary ([[HeavyHittersAggregator]]):
  *
  *  - Misra–Gries answers "which keys are heavy" (keeps keys, UNDER-counts:
  *    est ∈ [f − N/capacity, f]);
  *  - Count-Min answers "how often did THIS key occur" for any queried key
  *    (keeps no keys at all, OVER-counts: est ∈ [f, f + εN]).
  *
  * Structure: `depth` rows × `width` counters. Each arriving key
  * increments one counter per row, chosen by that row's seeded hash
  * (MurmurHash3 string hash — pure JVM arithmetic, identical on every
  * executor). The estimate for a key is the MINIMUM of its `depth`
  * counters: every counter is an upper bound on the key's true count
  * (its own increments plus colliding keys'), so the min is the tightest.
  *
  * Merge is POINTWISE ADDITION — unlike Misra–Gries, the final sketch is
  * a plain sum over rows and therefore IDENTICAL under any partitioning,
  * merge order, or parallelism: estimates are fully deterministic, which
  * is what lets the declared query put the ε-band verdict under the
  * DuckDB hash gate rather than rows-only.
  *
  * Guarantee: `f(x) ≤ est(x)` always (deterministic, collisions only add);
  * `est(x) ≤ f(x) + εN` with ε = e/width at confidence 1 − (1/e)^depth
  * over the hash draw — with the seeds FIXED the realized error is a
  * deterministic property of the corpus, asserted both in the declared
  * query's verdict columns and against exact counts in ScalaTest.
  *
  * Scale: the shuffle carries depth×width longs per partial (constant —
  * 4×1024 here is 32 KiB) regardless of corpus size or key cardinality;
  * the driver holds one such array. The exact-count comparison the
  * declared query performs is over the top-20 keys only.
  */
class CountMinAggregator(val depth: Int, val width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], tok: String): Array[Long] = {
    var i = 0
    while (i < depth) {
      b(i * width + CountMinAggregator.bucket(tok, i, width)) += 1L
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMinAggregator {

  /** Row `i`'s counter index for `tok`: seeded MurmurHash3 folded into
    * [0, width). Math.floorMod handles Int.MinValue correctly where
    * `abs % width` would not.
    */
  def bucket(tok: String, i: Int, width: Int): Int =
    Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(tok, 0x9747b28c + i), width)

  /** Driver-side point query against a collected sketch: min over rows. */
  def estimate(sketch: IndexedSeq[Long], tok: String,
      depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = sketch(i * width + bucket(tok, i, width))
      if (c < best) best = c
      i += 1
    }
    best
  }
}

package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** I3/K4: mergeable heavy-hitters sketch (Misra–Gries summary) as a typed
  * Aggregator — approximate top terms in ONE pass with FIXED memory.
  *
  * Why it exists next to the exact word-count query (`k4_word_counts`):
  * exact top-k over tokens shuffles one row per DISTINCT key after
  * map-side combine. For words that is vocabulary-sized and cheap; for
  * high-cardinality keys (5-gram phrases, URLs, near-unique ids) the
  * combine hash tables and the shuffle both blow up with the key space.
  * The Misra–Gries summary caps state at `capacity` counters per
  * partition, the shuffle carries at most `capacity` entries per partial,
  * and summaries MERGE soundly (Agarwal et al., "Mergeable Summaries",
  * PODS 2012): add counts pointwise, then subtract the (capacity+1)-th
  * largest count and drop non-positives.
  *
  * Guarantee: for true frequency f(x) over N items,
  * `f(x) − N/capacity ≤ estimate(x) ≤ f(x)` — every key with frequency
  * above N/capacity is GUARANTEED present. (The reduce step batches the
  * classic decrement-by-one into subtract-the-min, which amortizes to the
  * slightly-conservative ε = 1/capacity instead of 1/(capacity+1); the
  * mass-conservation argument is unchanged.) Estimates are
  * merge-order-dependent within that band (like any mergeable sketch, and
  * like Spark's own approx_count_distinct), so queries built on it are
  * declared rows-only, with the error bound asserted in ScalaTest against
  * exact counts.
  */
class HeavyHittersAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < capacity => b.updated(tok, 1L)
      case None =>
        // decrement-all step, amortized: drop the min count from everyone
        // (the classic MG counter decrement, batched at the map level)
        val dec = b.values.min
        b.flatMap { case (k, c) => if (c > dec) Some(k -> (c - dec)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      // subtract the (capacity+1)-th largest count, drop non-positives —
      // the PODS'12 mergeable-summaries rule
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      sum.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  /** Surviving counters, largest estimate first (ties: lexicographic). */
  override def finish(b: Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

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
    extends Aggregator[String, scala.collection.mutable.HashMap[String, Long],
      Seq[(String, Long)]] {

  require(capacity > 0, "capacity must be positive")

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  // Mutable buffer, mutated in place and returned: typed-aggregator
  // buffers live as objects between reduce calls (serialization happens
  // only at partial-result boundaries), and the saturated-sketch hot path
  // — a tail token arriving at a full table, the DOMINANT case for the
  // high-cardinality key spaces this exists for — must not rebuild a
  // 256-entry persistent map per token.
  override def zero: Buf = new Buf()

  override def reduce(b: Buf, tok: String): Buf = {
    b.get(tok) match {
      case Some(c) => b.update(tok, c + 1)
      case None if b.size < capacity => b.update(tok, 1L)
      case None =>
        // decrement-all step, amortized: drop the min count from everyone
        // (the classic MG counter decrement, batched at the map level).
        // Batching by `dec` = min is slightly more aggressive than the
        // textbook single decrement — when all counters are equal the
        // buffer empties in one step — but each batched step still
        // decrements every counter (and the arriving token's implicit 1)
        // by the same amount, so the MG invariant est ∈ [f − N/capacity, f]
        // is preserved; the ε-bound test exercises exactly this path.
        val dec = b.valuesIterator.min
        b.filterInPlace { case (_, c) => c > dec }
        b.mapValuesInPlace { case (_, c) => c - dec }
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives —
      // the PODS'12 mergeable-summaries rule
      val cut = a.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      a.filterInPlace { case (_, c) => c > cut }
      a.mapValuesInPlace { case (_, c) => c - cut }
    }
    a
  }

  /** Surviving counters, largest estimate first (ties: lexicographic). */
  override def finish(b: Buf): Seq[(String, Long)] =
    b.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

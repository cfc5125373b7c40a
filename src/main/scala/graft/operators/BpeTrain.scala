package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (Sennrich, Haddow & Birch, ACL 2016 — the
  * subword-nmt algorithm; public) — the vocabulary-learning step every
  * LLM data pipeline runs before tokenizing a corpus.
  *
  * Algorithm, exactly subword-nmt's word-level form:
  *  1. corpus → words → (distinct word, frequency); each word starts as
  *     its character sequence (no end-of-word marker — documented
  *     simplification);
  *  2. per round: count ADJACENT symbol pairs weighted by word frequency,
  *     pick the most frequent pair (ties: lexicographically smallest
  *     (left, right) — a total, engine-portable order), record the merge,
  *     and rewrite every word by a greedy LEFT-TO-RIGHT non-overlapping
  *     scan in which a symbol just created by a merge is never the left
  *     half of another merge in the same pass (subword-nmt's index-jump
  *     semantics: on a match, emit the merged symbol and skip both).
  *
  * Scale design: the corpus is touched ONCE (the word-frequency
  * aggregate); every training round then runs over the DISTINCT-WORD
  * table — vocabulary-sized, not corpus-sized (at 100 TB the vocab is
  * millions of rows while the corpus is billions) — as one partial-
  * aggregated pair count plus one per-row array rewrite, with
  * `localCheckpoint` truncating the per-round lineage exactly like the
  * PageRank loop. The only driver traffic is ONE (pair, count) row per
  * round.
  *
  * The greedy rewrite is a codegen'd `aggregate` fold over the symbol
  * array with a (out, justMerged) struct accumulator:
  * `try_element_at(out, -1)` probes the previous symbol (null on empty —
  * never matches), and the justMerged flag blocks same-pass re-merging.
  */
object BpeTrain {

  /** One training round's selected merge. */
  final case class Merge(rank: Int, lhs: String, rhs: String, cnt: Long)

  /** Character-split a word column (1-indexed substring — the same
    * per-character indexing the DuckDB oracle uses).
    */
  def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1)))

  /** Adjacent-pair counts weighted by `freq` over a (freq, syms) frame. */
  def pairCounts(words: DataFrame): DataFrame =
    words.where(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1), i =>
          struct(element_at(col("syms"), i).as("lhs"),
            element_at(col("syms"), i + 1).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum("freq").as("cnt"))

  /** Greedy left-to-right non-overlapping application of merge (a, b). */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      struct(typedLit(Seq.empty[String]).as("out"), lit(false).as("m")),
      (acc, x) => {
        val out = acc.getField("out")
        val hit = !acc.getField("m") &&
          (try_element_at(out, lit(-1)) === lit(a)) && (x === lit(b))
        when(hit,
          struct(
            concat(slice(out, lit(1), size(out) - 1), array(lit(a + b)))
              .as("out"),
            lit(true).as("m")))
          .otherwise(
            struct(concat(out, array(x)).as("out"), lit(false).as("m")))
      },
      acc => acc.getField("out"))

  /** Train `rounds` merges over a (word, freq) frame; returns the merge
    * table in rank order. Stops early if the pair supply runs dry.
    */
  def train(wordFreqs: DataFrame, rounds: Int): Seq[Merge] = {
    var cur = wordFreqs
      .select(col("freq"), charSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val top = pairCounts(cur)
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (a, b, c) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges += Merge(r, a, b, c)
        val next = cur.select(col("freq"),
          applyMerge(col("syms"), a, b).as("syms")).localCheckpoint(true)
        cur.unpersist()
        cur = next
        r += 1
      }
    }
    cur.unpersist()
    merges.result()
  }
}

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
    *
    * Job-count policy (the 32k-merges question): the distributed loop
    * below runs ONE Spark job per merge round (a vocab-sized pair count +
    * argmax), which is the right shape while the distinct-word table is
    * too big to hold — but at production vocab sizes (32k merges) it is
    * 32k driver round-trips of pure scheduling overhead on a loop whose
    * data is vocabulary-sized and SHRINKING. Exact merge batching cannot
    * fix that: a merge (a,b)→ab creates NEW pairs (x,ab)/(ab,y) whose
    * counts can exceed the next batched pick's count (each bounded only
    * by c_i of an EARLIER pick), so any multi-merge batch can diverge
    * from the sequential argmax trajectory — there is no sound
    * disjointness test on pre-batch counts alone. The fix that is both
    * exact and production-shaped is subword-nmt's own: the corpus-sized
    * work (word-frequency aggregate) stays distributed, and when the
    * DISTINCT-WORD table fits the driver (`maxLocalWords`, default 2M
    * rows ≈ a few hundred MB — typical even for 100 TB corpora, whose
    * vocabularies are millions of words, not billions), the rounds run
    * in [[trainLocal]]: an inverted-index incremental trainer with ZERO
    * Spark jobs per round. Above the threshold the per-round job loop
    * remains, with its measured overhead curve in BASELINE.md (ScaleCheck
    * `bpe` row) as the documented cost of vocabularies that genuinely
    * exceed driver memory.
    */
  def train(wordFreqs: DataFrame, rounds: Int,
      maxLocalWords: Long = -1L): Seq[Merge] = {
    // The local-trainer cap is CONSERVATIVE relative to driver heap, not
    // a flat constant: a collected (word, freq) tuple costs ~200 bytes
    // with object headers and boxing, and the collect must never be the
    // thing that OOMs a small driver. Budget 10% of max heap, hard-capped
    // at 2M words (where trainLocal's own structures stay comfortable);
    // `spark.graft.bpe.maxLocalWords` overrides, and a caller that wants
    // the purely-distributed path unconditionally calls
    // [[trainDistributed]] directly — no count() is paid there.
    val cap =
      if (maxLocalWords >= 0) maxLocalWords
      else wordFreqs.sparkSession.conf
        .getOption("spark.graft.bpe.maxLocalWords").map(_.toLong)
        .getOrElse(math.min(2000000L, Runtime.getRuntime.maxMemory() / 10 / 200))
    val n = wordFreqs.count()
    if (n <= cap) {
      import org.apache.spark.sql.Row
      val rows = wordFreqs.select(col("word"), col("freq").cast("long"))
        .collect().map { case Row(w: String, f: Long) => (w, f) }
      trainLocal(rows, rounds)
    } else trainDistributed(wordFreqs, rounds)
  }

  /** The per-round Spark-job loop — vocab-sized pair count + argmax +
    * per-row rewrite per round, `localCheckpoint` truncating lineage.
    * One (pair, count) row of driver traffic per round. Public: callers
    * that KNOW they want the distributed path (huge vocabularies, small
    * drivers) dispatch here directly and skip [[train]]'s sizing count().
    */
  def trainDistributed(wordFreqs: DataFrame, rounds: Int): Seq[Merge] = {
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

  /** Spark's string `asc` is UTF8String order — unsigned UTF-8 bytes —
    * which differs from Java's UTF-16 `String.compareTo` for
    * supplementary-plane vs U+E000..U+FFFF text. The local trainer's
    * tie-break must match the distributed argmax byte for byte.
    */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Driver-local trainer over a collected (word, freq) table — the
    * subword-nmt program itself (inverted index pair→words, incremental
    * pair-count deltas, best-pair heap), byte-identical to
    * [[trainDistributed]] by construction: same weighted adjacent-pair
    * counts (multiple occurrences within one word each count), same total
    * selection order (cnt DESC, lhs, rhs — lhs/rhs in UTF-8 byte order,
    * see [[utf8Compare]]), same greedy index-jump rewrite
    * ([[applyMerge]]'s semantics, including the "merged symbol is never
    * the left half of another merge in the same pass" rule and the fact
    * that an unmerged residue keeps the pair alive for later rounds).
    * BpeTrainSpec asserts the parity on corpus data.
    *
    * Cost per round: argmax O(log P) from the ordered set + rewrite and
    * recount ONLY over words containing the merged pair (the inverted
    * index; stale entries are harmless — a word without the pair rewrites
    * to itself with a zero delta). 32k merges run with zero Spark jobs.
    */
  def trainLocal(wordFreqs: Seq[(String, Long)], rounds: Int): Seq[Merge] = {
    import scala.collection.mutable
    // split by CODE POINT, not UTF-16 char: Spark's substring (and so
    // [[charSyms]]) walks code points, so a supplementary-plane character
    // must become ONE symbol, never a surrogate pair of half-symbols
    def codePointSyms(w: String): mutable.ArrayBuffer[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out
    }
    val words = wordFreqs.iterator.map { case (w, f) =>
      (codePointSyms(w), f)
    }.toArray

    val pairOrd: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(p: (Long, String, String), q: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(q._1, p._1) // cnt DESC
          if (c != 0) c
          else {
            val l = utf8Compare(p._2, q._2)
            if (l != 0) l else utf8Compare(p._3, q._3)
          }
        }
      }

    val stats = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.BitSet]
    val heap = mutable.TreeSet.empty[(Long, String, String)](pairOrd)

    def pairsOf(syms: collection.Seq[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else syms.iterator.zip(syms.iterator.drop(1))

    def bump(p: (String, String), delta: Long): Unit = if (delta != 0) {
      val old = stats.getOrElse(p, 0L)
      if (old != 0) heap.remove((old, p._1, p._2))
      val now = old + delta
      if (now == 0) stats.remove(p)
      else { stats(p) = now; heap.add((now, p._1, p._2)) }
    }

    words.zipWithIndex.foreach { case ((syms, f), i) =>
      pairsOf(syms).foreach { p =>
        bump(p, f)
        index.getOrElseUpdate(p, mutable.BitSet.empty) += i
      }
    }

    // greedy index-jump rewrite in place; returns true if anything merged
    def rewrite(syms: mutable.ArrayBuffer[String], a: String, b: String): Boolean = {
      var i = 0
      var merged = false
      while (i < syms.length - 1) {
        if (syms(i) == a && syms(i + 1) == b) {
          syms(i) = a + b
          syms.remove(i + 1)
          merged = true
          i += 1 // the merged symbol never left-merges again this pass
        } else i += 1
      }
      merged
    }

    val merges = Seq.newBuilder[Merge]
    var r = 1
    while (r <= rounds && heap.nonEmpty) {
      val (c, a, b) = heap.head
      merges += Merge(r, a, b, c)
      val touched = index.getOrElse((a, b), mutable.BitSet.empty)
      index.remove((a, b))
      touched.foreach { i =>
        val (syms, f) = words(i)
        val before = pairsOf(syms).toVector
        if (rewrite(syms, a, b)) {
          val after = pairsOf(syms).toVector
          val delta = mutable.HashMap.empty[(String, String), Long]
          before.foreach(p => delta(p) = delta.getOrElse(p, 0L) - f)
          after.foreach(p => delta(p) = delta.getOrElse(p, 0L) + f)
          delta.foreach { case (p, dlt) => bump(p, dlt) }
          after.foreach(p =>
            index.getOrElseUpdate(p, mutable.BitSet.empty) += i)
        }
      }
      r += 1
    }
    merges.result()
  }
}

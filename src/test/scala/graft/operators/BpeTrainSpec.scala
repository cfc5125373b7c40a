package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training: greedy-rewrite semantics (subword-nmt index-jump),
  * differential vs an independent in-memory reference, declared query.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the textbook subword-nmt loop. */
  private def refTrain(words: Map[String, Long],
      rounds: Int): Seq[(Int, String, String, Long)] = {
    var state = words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (w, syms) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + words(w)
        }
      }
      val ((a, b), c) = pc.minBy { case ((x, y), n) => (-n, x, y) }
      out += ((r, a, b, c))
      state = state.map { case (w, syms) =>
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
            nb += (a + b); i += 2
          } else { nb += syms(i); i += 1 }
        }
        w -> nb.result()
      }
    }
    out.result()
  }

  private def applied(word: String, a: String, b: String): Seq[String] =
    Seq(word).toDF("word")
      .select(BpeTrain.applyMerge(BpeTrain.charSyms(col("word")), a, b)
        .as("s"))
      .as[Seq[String]].head()

  test("greedy rewrite: left-to-right, non-overlapping, no same-pass re-merge") {
    // overlapping occurrences consume left-to-right
    assert(applied("aaa", "a", "a") == Seq("aa", "a"))
    assert(applied("aaaa", "a", "a") == Seq("aa", "aa"))
    // disjoint occurrences all merge in one pass
    assert(applied("abab", "a", "b") == Seq("ab", "ab"))
    // a symbol created by a merge is not the left half of another merge
    // in the same pass (subword-nmt's index jump): "aab" with (a,a) gives
    // [aa, b], and only a LATER round's (aa, b) merge could fuse them
    assert(applied("aab", "a", "a") == Seq("aa", "b"))
    // no match leaves the word untouched
    assert(applied("xyz", "a", "b") == Seq("x", "y", "z"))
  }

  test("train matches the independent reference loop on a crafted corpus") {
    val words = Map("lowlow" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "lowest" -> 1L)
    val df = words.toSeq.toDF("word", "freq")
    val got = BpeTrain.train(df, rounds = 8)
      .map(m => (m.rank, m.lhs, m.rhs, m.cnt))
    assert(got == refTrain(words, 8),
      s"engine trajectory diverged from the reference:\n$got")
  }

  test("distributed per-round loop matches the reference too (the big-vocab fallback)") {
    val words = Map("lowlow" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "lowest" -> 1L)
    val df = words.toSeq.toDF("word", "freq")
    val got = BpeTrain.trainDistributed(df, rounds = 8)
      .map(m => (m.rank, m.lhs, m.rhs, m.cnt))
    assert(got == refTrain(words, 8))
  }

  test("local and distributed trainers are byte-identical on corpus data") {
    val words = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)
    val local = BpeTrain.train(words, rounds = 15) // vocab << 2M -> local
    val dist = BpeTrain.trainDistributed(words, rounds = 15)
    assert(local == dist,
      s"local/distributed trajectories diverged:\n$local\nvs\n$dist")
  }

  test("local argmax tie-break is UTF-8 byte order (Spark's), not UTF-16") {
    // U+E000 sorts BEFORE U+1F600 in UTF-8 bytes (EE.. < F0..) but AFTER
    // it under Java's UTF-16 compareTo (0xE000 > 0xD83D) — the local
    // trainer must match the distributed argmax, i.e. UTF-8 order
    val words = Seq("" -> 1L, "😀😀" -> 1L)
    val local = BpeTrain.trainLocal(words, rounds = 1)
    val dist = BpeTrain.trainDistributed(words.toDF("word", "freq"), rounds = 1)
    assert(local == dist)
    assert(local.head.lhs == "")
  }

  test("declared k4_bpe_encode: tokens bounded by chars and words, ratio consistent") {
    val rows = graft.SparkEntry.queries("k4_bpe_encode")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, toks, chars, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      // merges only ever shrink a word, and a word is at least one token
      assert(toks <= chars, s"doc ${r.getLong(0)}: more tokens than chars")
      assert(toks >= words, s"doc ${r.getLong(0)}: fewer tokens than words")
      assert(math.abs(ratio - chars.toDouble / toks) < 1e-6)
    }
  }

  test("declared k4_bpe_train: 12 ranked merges, counts nonincreasing never guaranteed but positive") {
    val rows = graft.SparkEntry.queries("k4_bpe_train")(spark, sfDir).collect()
    assert(rows.length == 12)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 12))
    rows.foreach { r =>
      assert(r.getLong(3) > 0)
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K4/K3 (EXT): retrieval scoring — Okapi BM25 lexical ranking and
  * reciprocal-rank-fusion (RRF) of a lexical and a vector arm. Together
  * with the brute-force/ANN cosine ladder this completes the retrieval
  * surface a corpus engine serves: lexical, semantic, and hybrid.
  *
  * Scale design: the only row-multiplying stage is the token explode, and
  * it is FILTERED TO THE QUERY TERMS before any shuffle — candidate volume
  * is ∝ posting-list length (exactly the inverted-index access pattern),
  * never corpus length × query length. Corpus stats (N, avgdl) reduce to
  * ONE row and broadcast; per-term document frequencies reduce to
  * |query| rows and broadcast. Everything else is integer counts and a
  * constant number of double ops per candidate, inside whole-stage
  * codegen. RRF joins two ranked lists on the id — at production k the
  * lists are top-k'd first, so the fuse is constant-size; the declared
  * query fuses the FULL lists to keep the oracle total.
  *
  * Float determinism: counts and lengths are integer-exact; avgdl is an
  * exact-integer sum over an exact count; each score is a fixed
  * left-associated expression over those, rounded to 6 dp before any
  * rank — the repo-wide rule that makes DuckDB re-derivation exact.
  */
object Retrieval {

  /** Okapi BM25 scores for `terms` over `docs`: one row per document that
    * matches ≥1 query term — (doc_id, bm25, n_terms), unranked.
    * idf = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene non-negative
    * form); per-term score = idf · tf(k1+1)/(tf + k1(1 − b + b·dl/avgdl)).
    */
  def bm25Scores(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = graft.Tables.fanOut(docs)
      .select(col(idCol).as("_id"), split(col(textCol), " ").as("_t"))
      .select(col("_id"), col("_t"), size(col("_t")).cast("double").as("_dl"))
    // one-row corpus stats: N and avgdl (integer-exact sum / exact count)
    val corpus = toks.agg(count(lit(1)).cast("double").as("_n"),
      avg(col("_dl")).as("_avgdl"))
    val tf = toks
      .select(col("_id"), col("_dl"), explode(col("_t")).as("_term"))
      .filter(col("_term").isin(terms: _*))
      .groupBy(col("_id"), col("_dl"), col("_term"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val dfreq = tf.groupBy("_term")
      .agg(count(lit(1)).cast("double").as("_df"))
    tf.join(broadcast(dfreq), Seq("_term"))
      .crossJoin(broadcast(corpus))
      .withColumn("_idf",
        log((col("_n") - col("_df") + 0.5) / (col("_df") + 0.5) + 1.0))
      .withColumn("_s",
        col("_idf") * (col("_tf") * (k1 + 1)) /
          (col("_tf") +
            lit(k1) * (lit(1 - b) + lit(b) * col("_dl") / col("_avgdl"))))
      .groupBy("_id")
      .agg(round(sum(col("_s")), 6).as("bm25"),
        count(lit(1)).as("n_terms"))
      .select(col("_id").as(idCol), col("bm25"), col("n_terms"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09):
    * rrf = Σ_arms 1/(c + rank). Input arms are (id, score) frames; ranks
    * are derived HERE from (score desc, id asc) row_numbers so the fusion
    * is deterministic whatever produced the scores. Full outer union of
    * the arms: a doc in one arm only scores with that arm's term.
    *
    * `maxArm` is the operator's own scale bound: each arm is truncated to
    * its top-`maxArm` BEFORE the global rank window, via orderBy+limit —
    * planned as TakeOrderedAndProject, so the distributed top-k does the
    * work and the single-partition window then ranks ≤ `maxArm` rows. The
    * rank window is global by necessity (a rank is a total order), which
    * was safe only because every caller happened to pre-truncate; the
    * internal bound makes it safe BY CONTRACT — a corpus-sized arm can no
    * longer be ranked on one partition by accident. Truncation changes
    * nothing when an arm is already ≤ `maxArm`; a doc cut from an arm
    * scores 0 with that arm's term, exactly as if absent (RRF's standard
    * truncated-list contract).
    *
    * @return (idCol, rrf, lex_rank, vec_rank) — ranks null where absent
    */
  def rrfFuse(
      lex: DataFrame,
      vec: DataFrame,
      idCol: String,
      scoreCol: String = "score",
      c: Int = 60,
      maxArm: Int = 1000): DataFrame = {
    require(maxArm > 0, s"maxArm must be positive, got $maxArm")
    def ranked(df: DataFrame, rankName: String): DataFrame =
      df.orderBy(col(scoreCol).desc, col(idCol).asc)
        .limit(maxArm)
        .withColumn(rankName,
          row_number().over(
            Window.orderBy(col(scoreCol).desc, col(idCol).asc)))
        .select(col(idCol), col(rankName))
    val l = ranked(lex, "lex_rank")
    val v = ranked(vec, "vec_rank")
    def term(rank: Column): Column =
      coalesce(lit(1.0) / (lit(c.toDouble) + rank.cast("double")), lit(0.0))
    l.join(v, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(term(col("lex_rank")) + term(col("vec_rank")), 6).as("rrf"),
        col("lex_rank"), col("vec_rank"))
  }
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.VectorExpressions.dotFast
import graft.functions.VectorFunctions.asDouble

/** Training-data-pipeline operators the north star mandates beyond the
  * reference's own surface (SURVEY.md §2.K scope note): deterministic
  * corpus splitting/sampling/sharding, sequence packing, TF-IDF term
  * weighting, embedding-norm QA, merge-upsert, and an explicitly salted
  * skew join. Everything is hash-deterministic (md5 — the one digest both
  * Spark and DuckDB compute identically over UTF-8 strings), so every
  * query here carries a full DuckDB oracle.
  *
  * Scale notes per query live on each entry; the common theme: all
  * decisions are per-row hash arithmetic (no global state, no collect), so
  * each op is one scan + at most one hash aggregate — the shapes that
  * survive a 100 TB corpus unchanged.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** C8 body (shared with `tools.ScaleCheck` so the documented scaling
    * evidence measures exactly the shipped plan): per-event count of
    * same-user events in the preceding 5 minutes, via the banded
    * [[graft.operators.RangeJoin]] — one equi-shuffle on (user_id, 5-min
    * bucket) + exact filter where the naive theta join is O(|events|²).
    *
    * The interval is widened to INCLUDE the anchor's own instant
    * ([ms−5min, ms+1) instead of [ms−5min, ms)): every non-null anchor
    * then matches at least itself, so zero-prior anchors survive the
    * INNER join and no join-back scan is needed. The aggregate applies
    * the real strictly-before predicate (ms < anchor_ms), so self- and
    * same-instant matches count 0. Anchors with a NULL user_id or
    * timestamp — which the inner join silently drops (equi-join keys
    * never match NULL; a NULL interval never explodes) — re-enter
    * through the unioned null-anchor scan with n_prior = 0, the exact
    * retention semantics of the oracle's LEFT JOIN. That third scan
    * reads only pruned
    * columns behind an IS NULL pushdown, which parquet null-count
    * row-group stats skip entirely on null-free data: correctness for
    * free at scale.
    */
  def priorEventCounts(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"))
    val intervals = ev.select(col("event_id").as("anchor_id"), col("user_id"),
      (col("ms") - lit(300000L)).as("lo"), (col("ms") + lit(1L)).as("hi"),
      col("ms").as("anchor_ms"))
    val points = ev.select(col("event_id").as("prior_id"), col("user_id"), col("ms"))
    val counted = graft.operators.RangeJoin
      .pointInInterval(points, intervals, "ms", "lo", "hi",
        bucketWidth = 300000L, equiKeys = Seq("user_id"))
      .groupBy("anchor_id")
      .agg(sum(when(col("ms") < col("anchor_ms"), 1L).otherwise(0L)).as("n_prior"))
      .select(col("anchor_id").as("event_id"), col("n_prior"))
    val nullAnchors = ev
      .filter(col("user_id").isNull || col("ms").isNull)
      .select(col("event_id"), lit(0L).as("n_prior"))
    counted.unionAll(nullAnchors)
  }

  /** Deterministic per-row coin: first hex chars of md5 over a salted key.
    * Compared lexicographically against a hex threshold — avoids any
    * hex→int conversion (which the oracle engine lacks) while giving
    * 256 evenly-spaced buckets from two chars.
    */
  private def coin(saltPrefix: String, key: Column): Column =
    substring(md5(concat(lit(saltPrefix), key.cast("string"))), 1, 2)

  /** THE canonical train/valid assignment — one definition shared by
    * `k6_split_train_test` and `k6_corpus_pipeline`, so retuning the salt
    * or validation fraction can never de-synchronize the standalone split
    * from the end-to-end pipeline. Threshold '29' keeps hashes 00..28 →
    * 41/256 ≈ 16% validation.
    */
  private def trainValidSplit: Column =
    when(coin("split42:", col("doc_id")) < "29", lit("valid"))
      .otherwise(lit("train"))

  /** d14/j13's standing change-feed table: 4 appends (event_id % 4 slices)
    * + one OVERWRITE down to even ids, a pure function of the scale dir —
    * memoized per JVM (warm-artifact methodology, Tables.memoLayout).
    * Shared by the batch fold (d14) and the streaming source (j13), so the
    * two declared queries price their own consumption paths over ONE
    * staging.
    */
  private[analytics] def cdfEventsTable(s: SparkSession, d: String): String =
    Tables.memoLayout(s"d14|$d", "graft_cdf_inc") { base =>
      import graft.sources.SnapshotTable
      val t = s"$base/events_t"
      val ev = Tables.events(s, d).select("event_id", "event_type", "value")
      (0 until 4).foreach { i =>
        SnapshotTable.commitAppend(s, t,
          ev.filter(pmod(col("event_id"), lit(4)) === i))
      }
      SnapshotTable.commitOverwrite(s, t,
        ev.filter(pmod(col("event_id"), lit(2)) === 0))
    } + "/events_t"

  val queries: Map[String, Q] = Map(
    // K6: deterministic train/validation split — the foundational pipeline
    // op: assignment is a pure function of doc_id (stable across runs,
    // machines, and repartitioning; no sampling state to checkpoint) —
    // see [[trainValidSplit]].
    "k6_split_train_test" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("split", trainValidSplit)
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("split", "lang")
    }),

    // K6: per-source mixture sampling — downweight/upweight sources by a
    // deterministic keep-probability (the data-mixture knob of a pretraining
    // corpus). Rates cycle 12.5/25/50/75% by source index; the report shows
    // requested vs realized rates. One scan, one hash aggregate.
    "k6_mixture_sample" -> ((s, d) => {
      val srcNum = expr("CAST(substr(source, 4) AS INT)")
      val thr = when(srcNum % 4 === 0, lit("20"))
        .when(srcNum % 4 === 1, lit("40"))
        .when(srcNum % 4 === 2, lit("80"))
        .otherwise(lit("c0"))
      val kept = (coin("mix:", col("doc_id")) < thr).cast("long")
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"), sum(kept).as("n_kept"))
        .withColumn("realized_rate",
          round(col("n_kept").cast("double") / col("n_total"), 6))
        .orderBy("source")
    }),

    // K6: temperature-scaled mixture sampling (multinomial domain
    // reweighting, the multilingual-pretraining recipe): source i keeps
    // rate (n_min/n_i)^(1-α) with α = 0.5 — the smallest source keeps
    // everything, larger sources are downsampled toward balance. n_min
    // comes from a tiny integer aggregate (order-independent, unlike a
    // float sum over sources) broadcast back over the scan; the rate uses
    // only /, sqrt — IEEE correctly-rounded, so both engines compute the
    // identical double and the identical 12-bit hex threshold. Keep
    // decisions are the same deterministic md5 coin as k6_mixture_sample,
    // so resampling is stable across runs and repartitioning. One scan +
    // two tiny aggregates at any corpus size.
    "k6_mixture_temperature" -> ((s, d) => {
      val sizes = Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n_total"))
      val nMin = sizes.agg(min(col("n_total")).as("n_min"))
      val rates = sizes.crossJoin(broadcast(nMin))
        .withColumn("target_rate",
          sqrt(col("n_min").cast("double") / col("n_total")))
        // rate 1.0 would floor to 0x1000 — four hex digits, which lpad-3
        // would TRUNCATE into an almost-never threshold; 'zzz' sorts
        // above every hex string, i.e. keep-all
        .withColumn("_thr",
          when(col("target_rate") >= 1, lit("zzz"))
            .otherwise(lpad(lower(hex(
              floor(col("target_rate") * 4096).cast("long"))), 3, "0")))
        .select("source", "n_total", "target_rate", "_thr")
      Tables.documents(s, d)
        .join(broadcast(rates), Seq("source"))
        .withColumn("_kept",
          (substring(md5(concat(lit("mixT:"), col("doc_id").cast("string"))),
            1, 3) < col("_thr")).cast("long"))
        .groupBy("source", "n_total", "target_rate")
        .agg(sum(col("_kept")).as("n_kept"))
        .select(col("source"), col("n_total"),
          round(col("target_rate"), 6).as("target_rate"), col("n_kept"),
          round(col("n_kept").cast("double") / col("n_total"), 6)
            .as("realized_rate"))
        .orderBy("source")
    }),

    // K6: epoch schedule under a token budget — the data-constrained
    // repeat plan (Muennighoff et al., "Scaling Data-Constrained Language
    // Models": repeating up to ~4 epochs is near-free, beyond decays):
    // budget B = 2× corpus tokens split uniformly across sources; each
    // source repeats ceil(target / n_i) epochs capped at 4, and serves
    // min(target, 4·n_i) tokens — the shortfall is what the cap refuses
    // to fill by over-repeating. INTEGER arithmetic throughout (DIV +
    // multiply — a float epochs column would round differently across
    // engines); one scan + two one-row broadcast aggregates at any scale.
    "k6_epoch_schedule" -> ((s, d) => {
      val sizes = Tables.documents(s, d)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
      val totals = sizes.agg(
        (sum(col("n_tokens")) * 2).cast("long").as("budget"),
        count(lit(1)).cast("long").as("n_sources"))
      sizes.crossJoin(broadcast(totals))
        .withColumn("target_tokens", expr("budget DIV n_sources"))
        .withColumn("epochs",
          least(expr("(target_tokens + n_tokens - 1) DIV n_tokens"), lit(4L)))
        .withColumn("served_tokens",
          least(col("target_tokens"), col("n_tokens") * 4))
        .withColumn("shortfall", col("target_tokens") - col("served_tokens"))
        .select("source", "n_tokens", "target_tokens", "epochs",
          "served_tokens", "shortfall")
        .orderBy("source")
    }),

    // K6: token-budget corpus truncation — keep documents in deterministic
    // global order until half the corpus' tokens are consumed (the
    // fixed-token-budget cut every training run makes). The global running
    // sum is the textbook single-partition-window trap; PrefixSum computes
    // it with one balanced hash exchange + a bounded driver offset scan,
    // and the budget itself falls out of the same scan (no second global
    // aggregate). Integer arithmetic end-to-end, so the oracle's window
    // formulation hash-matches exactly.
    "k6_token_budget" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val (cum, total) = graft.operators.PrefixSum
        .globalCumsumAndTotal(t, "doc_id", "n_tokens", cumCol = "cum_tokens")
      cum.filter(col("cum_tokens") <= lit(total / 2))
        .select("doc_id", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    }),

    // K6: sequence packing (concat-and-chunk) — documents concatenated in
    // deterministic order and cut into fixed 512-token context blocks; a doc
    // whose tokens straddle a cut spans several blocks. The running sum is
    // windowed PER LANGUAGE (the shard key), so at scale each shard packs
    // independently — no global order, no single-partition window.
    "k6_pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum", sum("n_tokens").over(w))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          expr("(cum - n_tokens) div 512").as("first_block"),
          expr("(cum - 1) div 512").as("last_block"))
        .withColumn("n_blocks", col("last_block") - col("first_block") + 1)
        .orderBy("doc_id")
    }),

    // K6: context-window chunking with overlap — the RAG / pretraining
    // prep step the packed-blocks op doesn't cover: each document's token
    // stream is cut into 128-token windows every 96 tokens, so every
    // window boundary re-appears with 32 tokens of lead context in the
    // next window. Pure map-side fan-out (sequence + posexplode — chunks
    // of a doc never leave its partition, no shuffle before the
    // presentation sort), and each chunk ships as the md5 of its joined
    // tokens, so bytes-per-chunk stay constant no matter the window size —
    // at 100 TB the output is ~n_tokens/stride fixed-width rows, not a
    // re-materialized overlapping copy of the corpus.
    "k6_chunk_overlap" -> ((s, d) => {
      val win = 128L
      val stride = 96L
      Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .withColumn("n", size(col("t")).cast("long"))
        .select(col("doc_id"), col("t"), col("n"),
          posexplode(sequence(lit(0L), col("n") - 1, lit(stride))))
        .select(col("doc_id"), col("t"),
          col("pos").cast("long").as("chunk_idx"),
          col("col").as("start_tok"),
          least(lit(win), col("n") - col("col")).as("chunk_len"))
        .withColumn("chunk_hash", md5(concat_ws(" ",
          slice(col("t"), (col("start_tok") + 1).cast("int"),
            col("chunk_len").cast("int")))))
        .select("doc_id", "chunk_idx", "start_tok", "chunk_len", "chunk_hash")
        .orderBy("doc_id", "chunk_idx")
    }),

    // K6: deterministic corpus shuffle + sharding — shard = first hex char
    // of the row hash (16 shards, shuffle-free assignment), position within
    // shard = rank by the remaining hash. Windows are per-shard, so the op
    // scales as 16 independent sorts of |corpus|/16 — never a global order.
    "k6_shard_shuffle" -> ((s, d) => {
      val h = md5(concat(lit("shuf:"), col("doc_id").cast("string")))
      Tables.documents(s, d)
        .select(col("doc_id"), h.as("h"))
        .withColumn("shard", substring(col("h"), 1, 1))
        .withColumn("pos", row_number().over(
          Window.partitionBy("shard").orderBy("h", "doc_id")))
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    }),

    // K4: TF-IDF top terms — the term-weighting kernel of corpus analysis.
    // One exploded-token aggregate (map-side partial combine carries
    // |vocab|, not |tokens|, into the shuffle) + a broadcast one-row corpus
    // count; ln is computed identically by both engines and rounded.
    "k4_tfidf_top_terms" -> ((s, d) => {
      // n_total counts docs FROM THE EXPLODED WORD STREAM, same as the
      // oracle's CTE — counting the documents table instead would silently
      // include zero-token (NULL-text) docs in the IDF denominator and
      // diverge from the oracle's definition.
      val words = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val total = words.agg(countDistinct("doc_id").cast("double").as("n_total"))
      words
        .groupBy("word")
        .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
        .crossJoin(broadcast(total))
        .select(col("word"), col("tf"), col("df"),
          round(col("tf") * log(col("n_total") / col("df")), 6).as("tfidf"))
        .orderBy(col("tfidf").desc, col("word"))
        .limit(20)
    }),

    // K3: embedding-norm QA — per-label L2-norm distribution, the standard
    // sanity gate before cosine similarity (un-normalized or degenerate
    // vectors poison every downstream dot product). Norms via the codegen'd
    // dot expression, not an interpreted lambda.
    "k3_norm_stats" -> ((s, d) => {
      val v = asDouble(col("embedding"))
      Tables.embeddings(s, d)
        .select(col("label"), sqrt(dotFast(v, v)).as("nrm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(avg("nrm"), 6).as("avg_norm"),
          round(min("nrm"), 6).as("min_norm"),
          round(max("nrm"), 6).as("max_norm"))
        .orderBy("label")
    }),

    // C7: merge/upsert (SCD-1) — the DO-UPDATE half the reference's
    // ON CONFLICT DO NOTHING sink (A5) leaves on the table: full-outer join
    // of the existing dimension against an aggregated update feed;
    // unmatched-right inserts, matched updates, unmatched-left keeps.
    // Decimal accumulation keeps the money column order-insensitive.
    "c7_merge_upsert" -> ((s, d) => {
      val existing = Tables.customer(s, d)
        .filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"))
      val updates = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("spend"))
      existing.join(updates, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("c_name"), lit("(new)")).as("name"),
          when(col("o_custkey").isNull, lit("keep"))
            .when(col("c_custkey").isNull, lit("insert"))
            .otherwise(lit("update")).as("action"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          round(coalesce(col("spend"), lit(0.0)), 2).as("spend"))
        .orderBy("custkey")
    }),

    // C10 (EXT, round 11): CDC changelog APPLY with tombstones — the
    // Debezium-feed shape c7's single merge lacks: an ORDERED log of
    // upsert/delete ops per key collapses to its last-writer (row_number
    // over seq DESC — one shuffle on the key, the log never self-joins),
    // then applies to the base snapshot in one full-outer join: untouched
    // base rows pass through, a last-op U upserts (insert if the key was
    // absent), a last-op D tombstones the row out. Every rule is a total
    // deterministic function of (key, seq), so the oracle replays it
    // value-exact. Balances ride as DECIMAL through the merge.
    "c10_cdc_apply" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.customer(s, d)
        .filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("key"), col("c_name").as("name"),
          dec2(col("c_acctbal")).as("balance"))
      val log = Tables.orders(s, d).select(
        col("o_custkey").as("key"), col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 5 === 0, lit("D")).otherwise(lit("U"))
          .as("op"),
        dec2(col("o_totalprice")).as("new_balance"))
      val w = Window.partitionBy("key").orderBy(col("seq").desc)
      val last = log.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("key"), col("op"), col("new_balance"))
      base.join(last, Seq("key"), "full_outer")
        .filter(col("op").isNull || col("op") === "U")
        .select(col("key"),
          when(col("op").isNull, col("name"))
            .otherwise(coalesce(col("name"), lit("(inserted)"))).as("name"),
          when(col("op") === "U", col("new_balance"))
            .otherwise(col("balance")).cast("double").as("balance"),
          when(col("op").isNull, lit("base"))
            .when(col("name").isNull, lit("insert"))
            .otherwise(lit("update")).as("action"))
        .orderBy("key")
    }),

    // D6: incremental aggregation / materialized-view maintenance — the
    // events table arrives as four deterministic batches (event_id mod 4),
    // each is partially aggregated, and the partials fold through
    // IncrementalAgg.merge. Because every maintained aggregate is
    // decomposable and sums run in decimal, the folded state equals the
    // one-shot aggregate EXACTLY — which is what the oracle computes.
    "d6_incremental_agg" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val batches = (0 until 4).map(i => ev.filter(pmod(col("event_id"), lit(4)) === i))
      graft.operators.IncrementalAgg
        .fold(batches, Seq("user_id", "event_type"), "value")
        .select(col("user_id"), col("event_type"), col("n"),
          col("total").cast("double").as("total"), col("lo"), col("hi"))
        .orderBy("user_id", "event_type")
    }),

    // D14 (EXT): CHANGE-FEED-DRIVEN incremental aggregation — D6's
    // incremental-MV maintenance re-based on A17's change data feed, the
    // production shape for keeping a downstream aggregate current off a
    // lakehouse table WITHOUT rescanning it: each sync folds only the
    // rows that changed since the last consumed version (inserts add,
    // deletes subtract — count AND decimal sum are abelian, so the fold
    // is replay-order-free). The source table takes 4 appends plus an
    // OVERWRITE down to even event_ids; the maintainer consumes the feed
    // in two increments (0,2] and (2,5] and its folded state must equal
    // a from-scratch aggregate of the final table — which is exactly the
    // oracle (the oracle never sees the feed). Deletes are genuinely
    // exercised: the overwrite retires every prior file's rows.
    // D15 (EXT): UPDATE-IMAGE change-feed maintenance — the full public
    // CDF surface (insert / delete / update_preimage / update_postimage)
    // folded incrementally. A keyed MERGE commit (C7 upsert on the log
    // table) doubles the value of every even event_id: present keys emit
    // pre/post image pairs, absent keys emit inserts, copied-but-identical
    // neighbors in rewritten files emit NOTHING. The maintainer folds the
    // feed in two increments with the uniform sign (+1 insert/postimage,
    // −1 delete/preimage) — updates then net 0 rows and Δvalue exactly —
    // and its folded state must equal a from-scratch aggregate of the
    // final table, which is exactly what the oracle computes (it never
    // sees the feed or the merge mechanics).
    "d15_merge_cdf_agg" -> ((s, d) => {
      import graft.sources.SnapshotTable
      val dir = Tables.memoLayout(s"d15|$d", "graft_merge_cdf") { base =>
        val t = s"$base/events_m"
        val ev = Tables.events(s, d).select("event_id", "event_type", "value")
        SnapshotTable.commitAppend(s, t,
          ev.filter(pmod(col("event_id"), lit(3)) < 2))
        // value*2 is exact in IEEE doubles (power-of-two scale), so the
        // update images stay decimal-exact through the oracle compare
        SnapshotTable.commitMerge(s, t,
          ev.filter(pmod(col("event_id"), lit(2)) === 0)
            .withColumn("value", col("value") * 2),
          keyCols = Seq("event_id"))
      } + "/events_m"
      val sign = when(col("_change_type").isin("insert", "update_postimage"),
        lit(1)).otherwise(lit(-1))
      def fold(from: Int, to: Int): DataFrame =
        SnapshotTable.changes(s, dir, from, to)
          .groupBy("event_type")
          .agg(sum(sign).as("dn"),
            sum(col("value").cast(DecimalType(18, 2)) * sign).as("dv"))
      fold(0, 1).unionByName(fold(1, 2))
        .groupBy("event_type")
        .agg(sum(col("dn")).as("n"),
          sum(col("dv")).cast("double").as("total"))
        .filter(col("n") =!= 0)
        .orderBy("event_type")
    }),

    "d14_cdf_incremental_agg" -> ((s, d) => {
      import graft.sources.SnapshotTable
      // the five commits are staging (pure function of the scale dir,
      // memoized per JVM — Tables.memoLayout); the CHANGE-FEED FOLD over
      // the standing log is the operator under test and what the oracle
      // hash-checks
      val dir = cdfEventsTable(s, d)
      val sign = when(col("_change_type") === "insert", lit(1)).otherwise(lit(-1))
      def fold(from: Int, to: Int): DataFrame =
        SnapshotTable.changes(s, dir, from, to)
          .groupBy("event_type")
          .agg(sum(sign).as("dn"),
            sum(col("value").cast(DecimalType(18, 2)) * sign).as("dv"))
      fold(0, 2).unionByName(fold(2, 5))
        .groupBy("event_type")
        .agg(sum(col("dn")).as("n"),
          sum(col("dv")).cast("double").as("total"))
        // a group whose rows ALL net away (every event_id odd) folds to an
        // (n=0, total=0.0) row, but the from-scratch aggregate the oracle
        // runs omits the group entirely — drop net-zero groups so the
        // folded state is structurally equal to the oracle's final state
        .filter(col("n") =!= 0)
        .orderBy("event_type")
    }),

    // C6: salted fact-dim join — the manual skew mitigation (SURVEY §2
    // "salting for skew"): the fact side's join key gains a deterministic
    // 16-way salt, the dimension replicates once per salt value, and the
    // join runs on (key, salt) so one hot key spreads over 16 tasks instead
    // of one straggler. Result is provably identical to the unsalted join —
    // the oracle IS the plain join.
    "c6_join_salted" -> ((s, d) => {
      val saltChars = "0123456789abcdef".map(c => lit(c.toString))
      // Project BEFORE salting: the dimension replicates 16×, so every
      // column it still carries is shuffled 16 times — strip both sides to
      // exactly the join key + the columns the aggregate needs.
      //
      // The salt MUST vary WITHIN a join key (here: the row-level line
      // number) — a salt derived from the key alone maps every row of a hot
      // key to the same (key, salt) partition, paying the 16× replication
      // for zero straggler relief.
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("_salt",
          substring(md5(concat_ws(":", lit("salt"), col("l_orderkey"),
            col("l_linenumber"))), 1, 1))
        .drop("l_linenumber")
      val dim = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .withColumn("_salt", explode(array(saltChars: _*)))
        // salting exists for the shuffle-join regime (a dim too big to
        // broadcast + a skewed fact key). Catalyst still sees the
        // pre-explode size estimate and would BROADCAST the 16×-replicated
        // dim — a driver-built multi-million-entry hash table. Pin the
        // shuffle-hash plan the pattern is designed around.
        .hint("shuffle_hash")
      fact.join(dim,
          fact("l_orderkey") === dim("o_orderkey") && fact("_salt") === dim("_salt"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // C8: banded range join — per-event count of same-user events in the
    // preceding 5 minutes (velocity/fraud feature). The interval side is as
    // big as the point side, so the naive theta join is a nested loop;
    // RangeJoin's bucket trick turns it into one equi-shuffle on
    // (user_id, 5-min bucket) + an exact filter. See RangeJoin scaladoc.
    "c8_range_join" -> ((s, d) =>
      priorEventCounts(Tables.events(s, d)).orderBy("event_id")),

    // K6: decontamination — per eval doc, the fraction of its distinct
    // 3-grams already present anywhere in the train split (deterministic
    // doc_id % 4 partition). Semi-join on the gram key, never an
    // eval×train doc-pair join — see Dedup.contamination scaladoc.
    "k6_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Dedup.contamination(
          train = docs.filter(col("doc_id") % 4 =!= 0),
          eval_ = docs.filter(col("doc_id") % 4 === 0),
          textCol = "text", idCol = "doc_id", n = 3)
        .orderBy("doc_id")
    }),

    // K4: bigram language-model statistics — adjacent-pair counts plus the
    // conditional probability P(w2|w1), the kernel of n-gram LM scoring and
    // perplexity-based quality filters. Bigram extraction is ARRAY-LOCAL
    // (transform over token indices), so the only shuffles are the two
    // vocabulary-sized aggregates — token count never hits the wire.
    "k4_bigram_lm" -> ((s, d) => {
      // guard size >= 2: sequence(0, -1) would DESCEND ([0, -1] — Spark
      // infers step -1 when start > stop) and t[-1] throws under ANSI.
      // NULL text short-circuits the same way: CASE yields null, explode
      // drops the row.
      // fanOut: the corpus parquet is one row group → ONE scan partition;
      // tokenize + per-token struct build + explode (the row-multiplying
      // CPU stage before the first shuffle) must not serialize on one core.
      val pairs = Tables.fanOut(Tables.documents(s, d))
        .select(split(col("text"), " ").as("t"))
        .select(explode(expr(
          "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), " +
            "i -> struct(t[i] AS w1, t[i+1] AS w2)) END")).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
        .withColumn("cond_p", round(col("cnt").cast("double") /
          sum("cnt").over(Window.partitionBy("w1")), 6))
        .orderBy(col("cnt").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // K6: exact per-stratum quota sampling — balanced eval/calibration set
    // construction: per language, keep EXACTLY min(quota, n) docs, chosen
    // by smallest md5 pick-hash (deterministic, reshuffle-invariant, no
    // sampling state; unlike the RATE-based mixture samplers above, the
    // quota is exact, not expected). Shape: one shuffle on lang + a
    // per-group sorted row_number truncated at the quota — strata are
    // processed in parallel, and a stratum's work is sort-bounded, not
    // corpus-bounded. For quotas that scale WITH the stratum (e.g. 10%
    // exact), the same pick-hash becomes a per-stratum threshold select
    // (two tiny aggregates), so the operator's key — a total per-stratum
    // hash order — is the scale path too.
    "k6_stratified_sample" -> ((s, d) => {
      val quota = 40
      val ranked = Tables.documents(s, d)
        .withColumn("_pick", md5(concat(lit("strat:"), col("doc_id").cast("string"))))
        .withColumn("pick_rank",
          row_number().over(Window.partitionBy("lang").orderBy("_pick")))
      ranked.where(col("pick_rank") <= quota)
        .select(col("lang"), col("pick_rank"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "pick_rank")
    }),

    // K6: DSIR-style importance sampling (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling", simplified to
    // unigram LMs): every document is scored by the mean log-likelihood
    // ratio of its tokens under a TARGET unigram LM (here: the corpus's
    // English subset) vs the RAW-corpus LM, add-1 smoothed over the union
    // vocabulary; `kept` marks docs more target-like than raw. Shape: one
    // tokenize → vocab-sized count aggregate (map-side combined; vocab ≪
    // corpus) → one-row totals broadcast → token⋈LM equi-join → per-doc
    // aggregate. Determinism: each per-word log-ratio is quantized to
    // DECIMAL(12,6) BEFORE the per-doc sum (the docLmScore trick), so
    // partial-aggregation order cannot move the result, and `kept`
    // compares the EXACT decimal sum against zero.
    "k6_importance_sample" -> ((s, d) =>
      importanceSample(Tables.documents(s, d), targetLang = "en")
        .orderBy("doc_id")),

    // K4+: cross-split interpolated perplexity — the production shape of a
    // model-based quality filter: EVAL docs (doc_id % 4 = 0, the same
    // held-out split k6_decontaminate uses) scored under an LM trained
    // ONLY on the train split, so unseen bigrams and OOV words actually
    // occur and must be handled (k4_doc_lm_score's same-corpus MLE never
    // meets either). Jelinek–Mercer interpolation λ = 0.5 between the
    // bigram conditional and an add-1 unigram with a reserved OOV slot
    // keeps every position finite. Shape: three vocab-bounded LM
    // aggregates (map-side combined) left-joined onto the eval bigrams,
    // one per-doc aggregate — corpus-scan-shaped, no pair terms.
    // Determinism: per-position log is quantized to DECIMAL(12,6) before
    // the per-doc sum (exact decimal fold); ppl is exp of the ROUNDED
    // mean, so both engines exponentiate the identical double.
    "k4_cross_perplexity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      crossPerplexity(
          train = docs.filter(col("doc_id") % 4 =!= 0),
          eval_ = docs.filter(col("doc_id") % 4 === 0))
        .orderBy("doc_id")
    }),

    // K4+: model-based quality scoring — each document scored by the mean
    // log conditional probability of its bigrams under the corpus's own
    // bigram LM (the in-engine analogue of perplexity filtering: low
    // avg_logp = text unlike the corpus). Two aggregate passes + one join,
    // all keyed shuffles: (1) bigram explode → LM counts (vocab²-bounded,
    // i.e. FAR smaller than the corpus — at 100 TB this is the classic
    // heavy-aggregate-then-join shape, with map-side partial aggregation
    // collapsing each partition's counts before the shuffle); (2) doc
    // bigrams equi-join the LM on (w1, w2); (3) re-aggregate per doc.
    // Determinism: each log p is quantized to a 6-decimal DECIMAL before
    // the per-doc SUM, so the aggregate is exact decimal arithmetic —
    // partial-aggregation ORDER cannot move the result (a raw double sum
    // could flip the final 6-dp rounding at a boundary).
    "k4_doc_lm_score" -> ((s, d) =>
      docLmScore(Tables.documents(s, d)).orderBy("doc_id")),

    // K6+: the end-to-end corpus cleaning pipeline — the composition the
    // individual operators exist for: exact dedup (lowest-id survivor per
    // content digest) → the four quality gates (same thresholds as
    // k4_filter_cascade, via the shared TextQueries.qualitySignals) →
    // md5-deterministic train/valid split → per-split/lang admission
    // accounting. Every stage is a shape proven scale-safe on its own
    // (digest groupBy; array-local signals; per-row hash split; one final
    // tiny aggregate). The dedup is the K1 aggregate (digest + id on the
    // wire, never bodies) plus an id-keyed semi-join — document bodies
    // cross the wire exactly once, and the quality gates push to the scan
    // side of that join, so dropped docs never shuffle at all. Local-mode
    // bench note: that same pushdown pins the gate evaluation onto the
    // corpus's single-row-group scan partition, so the measured time is
    // single-core interpreted-HOF cost — an artifact of the one-file test
    // corpus, not of the plan (BASELINE.md round-5 notes).
    // K6 (EXT, round 11): DATASET CARD — the one-row datasheet every
    // released training corpus ships (Gebru et al. 2018, "Datasheets for
    // Datasets"): scale (docs/tokens/chars), provenance breadth
    // (sources, languages), and integrity (exact-duplicate share) in ONE
    // corpus pass — a single aggregate with distinct-count sub-plans,
    // no joins, no second scan. Ratios are two exact BIGINTs through one
    // IEEE division (bit-identical across engines); duplicate share =
    // (rows − distinct text digests) / rows.
    "k6_dataset_card" -> ((s, d) => {
      Tables.documents(s, d)
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
          sum(length(col("text")).cast("long")).as("total_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .select(col("n_docs"), col("n_sources"), col("n_langs"),
          col("total_tokens"), col("total_chars"),
          (col("total_tokens").cast("double") / col("n_docs"))
            .as("mean_doc_tokens"),
          ((col("n_docs") - col("n_distinct_texts")).cast("double") /
            col("n_docs")).as("exact_dup_share"))
    }),

    "k6_corpus_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // dedup via the K1 aggregate shape (digest groupBy → MIN survivor id,
      // 32-byte keys + ids on the wire) + an id-keyed semi-join back to the
      // rows — bodies shuffle once, by doc_id
      val survivorIds = docs
        .groupBy(sha2(col("text"), 256).as("dig"))
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val survivors = docs.join(survivorIds, Seq("doc_id"), "left_semi")
      val admitted = TextQueries.qualityGates
        .foldLeft(TextQueries.qualitySignals(survivors)) {
          case (df, (_, gate)) => df.filter(gate)
        }
      admitted
        .withColumn("split", trainValidSplit)
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          sum("nw").as("total_words"))
        .orderBy("split", "lang")
    })
  )

  /** K4+ body (shared with `tools.ScaleCheck` so the documented scaling
    * evidence measures exactly the shipped plan) — see the `k4_doc_lm_score`
    * entry's scaladoc above for the full scale analysis.
    */
  /** Cross-split interpolated perplexity — see the `k4_cross_perplexity`
    * entry for the shape and determinism contract. Per eval-doc bigram
    * position (w1, w2):
    * p = 0.5·p_bi(w2|w1) + 0.5·p_uni(w2), with
    * p_bi = c(w1,w2)/c(w1·) (0 when the context or pair is unseen) and
    * p_uni = (c(w2)+1)/(N+V+1) (the +1 in the denominator reserves mass
    * for OOV, whose probability is 1/(N+V+1)).
    */
  def crossPerplexity(train: DataFrame, eval_ : DataFrame): DataFrame = {
    def bigrams(df: DataFrame) = Tables.fanOut(df)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), " +
          "i -> struct(t[i] AS w1, t[i+1] AS w2)) END")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val trainBg = bigrams(train)
    val biLm = trainBg.groupBy("w1", "w2").agg(count(lit(1)).as("c_bi"))
    val ctxLm = trainBg.groupBy("w1").agg(count(lit(1)).as("c_ctx"))
    val uniTok = Tables.fanOut(train)
      .select(explode(split(col("text"), " ")).as("w"))
    val uniLm = uniTok.groupBy("w").agg(count(lit(1)).as("c_uni"))
    val totals = uniLm.agg(
      sum("c_uni").as("n_tok"), count(lit(1)).as("v"))
    val scored = bigrams(eval_)
      .join(biLm, Seq("w1", "w2"), "left")
      .join(ctxLm, Seq("w1"), "left")
      .join(uniLm.withColumnRenamed("w", "w2"), Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      // parenthesization is part of the oracle contract: each term is
      // 0.5 × (ratio), both ratios divided BEFORE the halving, then one
      // IEEE add — the SQL mirrors the identical operation order
      .withColumn("_p",
        (lit(0.5) * when(col("c_ctx").isNotNull && col("c_bi").isNotNull,
            col("c_bi").cast("double") / col("c_ctx").cast("double"))
          .otherwise(lit(0.0))) +
        (lit(0.5) * ((coalesce(col("c_uni"), lit(0L)) + 1).cast("double") /
          (col("n_tok") + col("v") + 1).cast("double"))))
      .withColumn("_logp6", round(log(col("_p")), 6).cast(DecimalType(12, 6)))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("_logp6").as("_sum"))
      // the average is the exact decimal sum through ONE IEEE division —
      // emitted UNROUNDED: the sum sits on the 1e-6 grid, so s/n lands
      // exactly on round()'s half-boundary whenever 2·s_micros ≡ n
      // (mod 2n), and the engines' round paths disagree there (Spark
      // rounds the shortest decimal repr, DuckDB the scaled binary —
      // bit you on k6_importance_sample doc 1374 at sf0.1: −88309/26)
      .withColumn("avg_logp", col("_sum").cast("double") / col("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"),
        round(exp(-col("avg_logp")), 6).as("ppl"))
  }

  /** DSIR-lite importance scorer — see the `k6_importance_sample` entry
    * for the shape and determinism contract. Target LM = `targetLang`
    * docs; raw LM = the whole corpus; both add-1 smoothed over the union
    * vocab so every token has a finite ratio.
    */
  def importanceSample(docs: DataFrame, targetLang: String): DataFrame = {
    val tok = Tables.fanOut(docs)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
    val counts = tok.groupBy("w").agg(
      count(lit(1)).as("c_all"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("c_tgt"))
    val totals = counts.agg(
      count(lit(1)).as("v"),
      sum("c_all").as("tok_all"),
      sum("c_tgt").as("tok_tgt"))
    val lm = counts.crossJoin(broadcast(totals))
      .withColumn("lr6",
        round(
          log((col("c_tgt") + 1).cast("double") / (col("tok_tgt") + col("v")).cast("double")) -
            log((col("c_all") + 1).cast("double") / (col("tok_all") + col("v")).cast("double")),
          6).cast(DecimalType(12, 6)))
      .select("w", "lr6")
    tok.join(lm, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lr6").as("_sum"))
      .select(col("doc_id"), col("n_tokens"),
        // unrounded for the same half-boundary reason as avg_logp above
        (col("_sum").cast("double") / col("n_tokens")).as("avg_logratio"),
        (col("_sum") > 0).as("kept"))
  }

  def docLmScore(docs: DataFrame): DataFrame = {
    val bg = Tables.fanOut(docs)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), " +
          "i -> struct(t[i] AS w1, t[i+1] AS w2)) END")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val lm = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .withColumn("logp6",
        round(log(col("cnt").cast("double") /
          sum("cnt").over(Window.partitionBy("w1"))), 6)
          .cast(DecimalType(12, 6)))
      .drop("cnt")
    bg.join(lm, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (sum("logp6").cast("double") / count(lit(1))).as("avg_logp"))
  }

  val oracle: Map[String, String] = Map(
    "k6_stratified_sample" ->
      """WITH r AS (SELECT lang, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR))) AS rn
        |  FROM documents)
        |SELECT lang, CAST(rn AS INTEGER) AS pick_rank, doc_id, n_chars
        |FROM r WHERE rn <= 40 ORDER BY lang, pick_rank""".stripMargin,

    // Same LM construction, same fold discipline as the engine: add-1
    // smoothed unigram ratios quantized to DECIMAL(12,6) per WORD, exact
    // decimal per-doc sum, `kept` on the exact sum's sign.
    "k6_importance_sample" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |cnt AS (SELECT w, COUNT(*) AS c_all,
        |          SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
        |        FROM tok GROUP BY w),
        |tot AS (SELECT COUNT(*) AS v, SUM(c_all) AS tok_all, SUM(c_tgt) AS tok_tgt FROM cnt),
        |lm AS (SELECT w,
        |  CAST(ROUND(
        |    ln(CAST(c_tgt + 1 AS DOUBLE) / CAST(tok_tgt + v AS DOUBLE)) -
        |    ln(CAST(c_all + 1 AS DOUBLE) / CAST(tok_all + v AS DOUBLE)), 6)
        |    AS DECIMAL(12, 6)) AS lr6
        |  FROM cnt, tot),
        |sc AS (SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(l.lr6) AS s
        |       FROM tok t JOIN lm l ON t.w = l.w GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens,
        |  CAST(s AS DOUBLE) / n_tokens AS avg_logratio,
        |  s > 0 AS kept
        |FROM sc ORDER BY doc_id""".stripMargin,

    "k6_split_train_test" ->
      """SELECT CASE WHEN substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 2) < '29'
        |            THEN 'valid' ELSE 'train' END AS split,
        |  lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    "k6_mixture_sample" ->
      """WITH t AS (
        |  SELECT source,
        |    CASE (CAST(substr(source, 4) AS INTEGER) % 4)
        |      WHEN 0 THEN '20' WHEN 1 THEN '40' WHEN 2 THEN '80' ELSE 'c0' END AS thr,
        |    substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN h < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  ROUND(CAST(SUM(CASE WHEN h < thr THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
        |    AS realized_rate
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    // Same arithmetic, same operation order as the engine: n_min/n_i in
    // double, sqrt, ×4096, floor — every step correctly rounded, so the
    // hex thresholds agree bit-for-bit.
    "k6_mixture_temperature" ->
      """WITH s AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY 1),
        |m AS (SELECT MIN(n_total) AS n_min FROM s),
        |r AS (
        |  SELECT source, n_total,
        |    sqrt(CAST(n_min AS DOUBLE) / n_total) AS target_rate
        |  FROM s, m),
        |t AS (
        |  SELECT source, n_total, target_rate,
        |    CASE WHEN target_rate >= 1 THEN 'zzz'
        |         ELSE lpad(lower(to_hex(CAST(floor(target_rate * 4096) AS BIGINT))), 3, '0')
        |    END AS thr
        |  FROM r)
        |SELECT d.source, t.n_total, ROUND(t.target_rate, 6) AS target_rate,
        |  CAST(SUM(CASE WHEN substr(md5('mixT:' || CAST(d.doc_id AS VARCHAR)), 1, 3) < t.thr
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  ROUND(CAST(SUM(CASE WHEN substr(md5('mixT:' || CAST(d.doc_id AS VARCHAR)), 1, 3) < t.thr
        |                 THEN 1 ELSE 0 END) AS DOUBLE) / t.n_total, 6) AS realized_rate
        |FROM documents d JOIN t USING (source)
        |GROUP BY d.source, t.n_total, t.target_rate
        |ORDER BY source""".stripMargin,

    // Integer DIV/multiply mirror — no float epochs anywhere.
    "k6_epoch_schedule" ->
      """WITH sizes AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(n_tokens) * 2 AS BIGINT) AS budget,
        |             CAST(COUNT(*) AS BIGINT) AS n_sources FROM sizes)
        |SELECT s.source, s.n_tokens,
        |  CAST(t.budget // t.n_sources AS BIGINT) AS target_tokens,
        |  CAST(LEAST((t.budget // t.n_sources + s.n_tokens - 1) // s.n_tokens,
        |             4) AS BIGINT) AS epochs,
        |  CAST(LEAST(t.budget // t.n_sources, s.n_tokens * 4) AS BIGINT)
        |    AS served_tokens,
        |  CAST(t.budget // t.n_sources
        |       - LEAST(t.budget // t.n_sources, s.n_tokens * 4) AS BIGINT)
        |    AS shortfall
        |FROM sizes s, t ORDER BY s.source""".stripMargin,

    // Budget = floor(total/2): DuckDB's window SUM yields HUGEINT, so both
    // it and the budget cast back to BIGINT to match Spark's long.
    "k6_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (SELECT CAST(SUM(n_tokens) // 2 AS BIGINT) AS budget FROM t),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tokens
        |  FROM t)
        |SELECT c.doc_id, c.n_tokens, c.cum_tokens
        |FROM c, b WHERE c.cum_tokens <= b.budget ORDER BY doc_id""".stripMargin,

    "k6_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, lang, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS first_block,
        |  CAST((cum - 1) // 512 AS BIGINT) AS last_block,
        |  CAST((cum - 1) // 512 - (cum - n_tokens) // 512 + 1 AS BIGINT) AS n_blocks
        |FROM c ORDER BY doc_id""".stripMargin,

    // Spark's sequence(0, n-1, 96) and DuckDB's range(0, n, 96) generate
    // the same start set for n >= 1 (both sides see n >= 1: split of a
    // non-null text yields at least ['']); list slicing is 1-based
    // inclusive on both.
    "k6_chunk_overlap" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (
        |  SELECT doc_id, t, n, UNNEST(range(0, n, 96)) AS start_tok
        |  FROM d)
        |SELECT doc_id,
        |  CAST(start_tok // 96 AS BIGINT) AS chunk_idx,
        |  CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(LEAST(128, n - start_tok) AS BIGINT) AS chunk_len,
        |  md5(array_to_string(
        |    t[start_tok + 1 : start_tok + LEAST(128, n - start_tok)], ' '))
        |    AS chunk_hash
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "k6_shard_shuffle" ->
      """WITH t AS (
        |  SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents)
        |SELECT doc_id, substr(h, 1, 1) AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY substr(h, 1, 1) ORDER BY h, doc_id)
        |       AS INTEGER) AS pos
        |FROM t ORDER BY doc_id""".stripMargin,

    "k4_tfidf_top_terms" ->
      """WITH w AS (
        |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents),
        |tot AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_total FROM w),
        |stats AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS tf,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM w GROUP BY word)
        |SELECT word, tf, df, ROUND(tf * ln(n_total / df), 6) AS tfidf
        |FROM stats, tot
        |ORDER BY tfidf DESC, word LIMIT 20""".stripMargin,

    "k3_norm_stats" ->
      """WITH n AS (
        |  SELECT vec_id, label,
        |    sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
        |  FROM (SELECT vec_id, label, UNNEST(embedding) AS v FROM embeddings)
        |  GROUP BY vec_id, label)
        |SELECT label, COUNT(*) AS n_vecs,
        |  ROUND(AVG(nrm), 6) AS avg_norm,
        |  ROUND(MIN(nrm), 6) AS min_norm,
        |  ROUND(MAX(nrm), 6) AS max_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,

    "c7_merge_upsert" ->
      """WITH existing AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0),
        |upd AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |  COALESCE(c_name, '(new)') AS name,
        |  CASE WHEN o_custkey IS NULL THEN 'keep'
        |       WHEN c_custkey IS NULL THEN 'insert'
        |       ELSE 'update' END AS action,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  ROUND(COALESCE(spend, 0.0), 2) AS spend
        |FROM existing FULL OUTER JOIN upd ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    // identical replay of the CDC rules: last-writer per key by seq,
    // U upserts (insert on absent key), D tombstones, untouched base
    // rows pass through
    "c10_cdc_apply" ->
      """WITH base AS (
        |  SELECT c_custkey AS key, c_name AS name,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS balance
        |  FROM customer WHERE c_custkey % 3 = 0),
        |log AS (
        |  SELECT o_custkey AS key, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS new_balance
        |  FROM orders),
        |last AS (
        |  SELECT key, op, new_balance FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        |    FROM log)
        |  WHERE rn = 1)
        |SELECT COALESCE(b.key, l.key) AS key,
        |  CASE WHEN l.op IS NULL THEN b.name
        |       ELSE COALESCE(b.name, '(inserted)') END AS name,
        |  CAST(CASE WHEN l.op = 'U' THEN l.new_balance ELSE b.balance END
        |       AS DOUBLE) AS balance,
        |  CASE WHEN l.op IS NULL THEN 'base'
        |       WHEN b.name IS NULL THEN 'insert'
        |       ELSE 'update' END AS action
        |FROM base b FULL OUTER JOIN last l ON b.key = l.key
        |WHERE l.op IS NULL OR l.op = 'U'
        |ORDER BY key""".stripMargin,

    // The folded incremental state must equal the one-shot aggregate —
    // that equality is the operator's correctness contract, so the oracle
    // deliberately aggregates the whole table in one pass.
    "d6_incremental_agg" ->
      """SELECT user_id, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total,
        |  MIN(value) AS lo, MAX(value) AS hi
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    // the oracle aggregates the FINAL table state from scratch — a hash
    // match proves the change-feed folds (incl. the overwrite's deletes)
    // maintained the aggregate exactly
    // the oracle is the FINAL table state re-derived from the source:
    // even ids carry the doubled (merged) value, odd ids survive only if
    // the base append (%3<2) included them
    "d15_merge_cdf_agg" ->
      """WITH fin AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 2 = 0 THEN value * 2 ELSE value END AS value
        |  FROM events
        |  WHERE event_id % 2 = 0 OR event_id % 3 < 2)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM fin GROUP BY event_type ORDER BY event_type""".stripMargin,

    "d14_cdf_incremental_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events WHERE event_id % 2 = 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The salted plan must equal the PLAIN join — that equality is the
    // entire point, so the oracle deliberately omits the salt.
    "c6_join_salted" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // The banded plan must equal the plain theta join — the oracle writes
    // the naive range predicate DuckDB executes as an IEJoin. epoch_ms on
    // both sides: ms-truncation (floor, positive epochs) matches Spark's
    // unix_millis over the micros-truncated ts.
    "c8_range_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
        |  FROM events),
        |m AS (
        |  SELECT a.event_id, COUNT(b.event_id) AS n_prior
        |  FROM e a LEFT JOIN e b
        |    ON a.user_id = b.user_id
        |   AND b.ms >= a.ms - 300000 AND b.ms < a.ms
        |  GROUP BY a.event_id)
        |SELECT event_id, n_prior FROM m ORDER BY event_id""".stripMargin,

    // Same shingling idiom as k2_ngram_jaccard's oracle (proven parity
    // with WordShinglesExpr); list_distinct mirrors the expression's
    // LinkedHashSet dedup, LEFT JOIN against the distinct train gram set
    // mirrors the left-semi + count.
    "k6_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM t WHERE len(w) >= 3),
        |tr AS (SELECT DISTINCT UNNEST(s) AS gram FROM sh WHERE doc_id % 4 <> 0),
        |ev AS (SELECT doc_id, UNNEST(s) AS gram FROM sh WHERE doc_id % 4 = 0),
        |agg AS (
        |  SELECT e.doc_id, COUNT(*) AS n_grams, COUNT(tr.gram) AS n_shared
        |  FROM ev e LEFT JOIN tr ON e.gram = tr.gram
        |  GROUP BY e.doc_id)
        |SELECT doc_id, n_grams, n_shared,
        |  ROUND(CAST(n_shared AS DOUBLE) / n_grams, 6) AS contamination
        |FROM agg ORDER BY doc_id""".stripMargin,

    "k4_bigram_lm" ->
      """WITH t AS (SELECT string_split(text, ' ') AS a FROM documents),
        |b AS (
        |  SELECT a[i] AS w1, a[i + 1] AS w2
        |  FROM t, UNNEST(generate_series(1, len(a) - 1)) AS s(i)
        |  WHERE len(a) >= 2),
        |c AS (SELECT w1, w2, COUNT(*) AS cnt FROM b GROUP BY w1, w2)
        |SELECT w1, w2, cnt,
        |  ROUND(CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY w1), 6)
        |    AS cond_p
        |FROM c ORDER BY cnt DESC, w1, w2 LIMIT 20""".stripMargin,

    // Mirrors the engine's decimal quantization: ln(p) rounded to 6 dp,
    // cast DECIMAL(12,6), summed exactly, then one final division+round.
    // Mirrors the engine's exact operation order: both interpolation
    // ratios divide BEFORE the exact 0.5 halving, one IEEE add, ln
    // quantized to DECIMAL(12,6) per position, exact decimal per-doc sum,
    // ppl = exp of the ROUNDED mean.
    "k4_cross_perplexity" ->
      """WITH tr AS (SELECT text FROM documents WHERE doc_id % 4 <> 0),
        |trt AS (SELECT string_split(text, ' ') AS a FROM tr),
        |trb AS (SELECT a[i] AS w1, a[i + 1] AS w2
        |        FROM trt, UNNEST(generate_series(1, len(a) - 1)) AS s(i)
        |        WHERE len(a) >= 2),
        |bi AS (SELECT w1, w2, COUNT(*) AS c_bi FROM trb GROUP BY w1, w2),
        |ctx AS (SELECT w1, COUNT(*) AS c_ctx FROM trb GROUP BY w1),
        |unit AS (SELECT unnest(string_split(text, ' ')) AS w FROM tr),
        |uni AS (SELECT w, COUNT(*) AS c_uni FROM unit GROUP BY w),
        |tot AS (SELECT SUM(c_uni) AS n_tok, COUNT(*) AS v FROM uni),
        |evt AS (SELECT doc_id, string_split(text, ' ') AS a
        |        FROM documents WHERE doc_id % 4 = 0),
        |evb AS (SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
        |        FROM evt, UNNEST(generate_series(1, len(a) - 1)) AS s(i)
        |        WHERE len(a) >= 2),
        |p AS (SELECT e.doc_id,
        |    (0.5 * CASE WHEN c.c_ctx IS NOT NULL AND b.c_bi IS NOT NULL
        |                THEN CAST(b.c_bi AS DOUBLE) / CAST(c.c_ctx AS DOUBLE)
        |                ELSE 0.0 END)
        |  + (0.5 * (CAST(COALESCE(u.c_uni, 0) + 1 AS DOUBLE)
        |            / CAST(t.n_tok + t.v + 1 AS DOUBLE))) AS pr
        |  FROM evb e
        |  LEFT JOIN bi b ON e.w1 = b.w1 AND e.w2 = b.w2
        |  LEFT JOIN ctx c ON e.w1 = c.w1
        |  LEFT JOIN uni u ON e.w2 = u.w
        |  CROSS JOIN tot t),
        |q AS (SELECT doc_id, COUNT(*) AS n_bigrams,
        |        SUM(CAST(ROUND(ln(pr), 6) AS DECIMAL(12, 6))) AS s
        |      FROM p GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  CAST(s AS DOUBLE) / n_bigrams AS avg_logp,
        |  ROUND(exp(-(CAST(s AS DOUBLE) / n_bigrams)), 6) AS ppl
        |FROM q ORDER BY doc_id""".stripMargin,

    "k4_doc_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |b AS (
        |  SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
        |  FROM t, UNNEST(generate_series(1, len(a) - 1)) AS s(i)
        |  WHERE len(a) >= 2),
        |c AS (SELECT w1, w2, COUNT(*) AS cnt FROM b GROUP BY w1, w2),
        |lm AS (
        |  SELECT w1, w2,
        |    CAST(ROUND(ln(CAST(cnt AS DOUBLE) /
        |      SUM(cnt) OVER (PARTITION BY w1)), 6) AS DECIMAL(12, 6)) AS logp6
        |  FROM c)
        |SELECT b.doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(logp6) AS DOUBLE) / COUNT(*) AS avg_logp
        |FROM b JOIN lm USING (w1, w2)
        |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin,

    // Independent re-composition: MIN(doc_id)-per-content dedup, the same
    // four gate predicates, the same md5 split, same accounting.
    // identical single-pass datasheet; the two ratios are the same
    // BIGINT/BIGINT IEEE divisions
    "k6_dataset_card" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
        |    / CAST(COUNT(*) AS DOUBLE) AS mean_doc_tokens,
        |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
        |    / CAST(COUNT(*) AS DOUBLE) AS exact_dup_share
        |FROM documents""".stripMargin,

    "k6_corpus_pipeline" ->
      """WITH surv AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
        |d AS (SELECT doc.* FROM documents doc JOIN surv USING (doc_id)),
        |s AS (
        |  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w,
        |    len(string_split(text, ' ')) AS nw
        |  FROM d),
        |sig AS (
        |  SELECT doc_id, lang, n_chars, nw,
        |    CAST(n_chars - nw + 1 AS DOUBLE) / nw AS awl,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'a', 'and', 'of', 'to')))
        |      AS DOUBLE) / nw AS sr,
        |    CASE WHEN nw >= 2
        |         THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |    END AS bg
        |  FROM s),
        |g AS (
        |  SELECT doc_id, lang, n_chars, nw
        |  FROM (SELECT *,
        |          CAST(list_max(list_transform(list_distinct(bg),
        |              x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / len(bg) AS tbf
        |        FROM sig)
        |  WHERE nw >= 20 AND awl <= 4.8 AND sr >= 0.03 AND tbf <= 0.09)
        |SELECT CASE WHEN substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 2) < '29'
        |            THEN 'valid' ELSE 'train' END AS split,
        |  lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(nw) AS BIGINT) AS total_words
        |FROM g GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
  )
}

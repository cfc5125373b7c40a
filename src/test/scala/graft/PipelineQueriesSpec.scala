package graft

import graft.analytics.PipelineQueries
import org.apache.spark.sql.functions._

/** K6 training-data-pipeline ops + C7 merge + the salted-join equivalence
  * (PipelineQueries). Semantic properties, not golden values — the DuckDB
  * oracle covers exact output; these assert the invariants that make each
  * operator correct by construction.
  */
class PipelineQueriesSpec extends SparkSpec {

  private def q(name: String) = PipelineQueries.queries(name)(spark, sfDir)

  test("temperature mixture keeps the smallest source whole and downsamples by size") {
    val rows = q("k6_mixture_temperature").collect()
    val nMin = rows.map(_.getAs[Long]("n_total")).min
    rows.foreach { r =>
      val n = r.getAs[Long]("n_total")
      val rate = r.getAs[Double]("target_rate")
      val want = math.sqrt(nMin.toDouble / n)
      assert(math.abs(rate - want) < 1e-6,
        s"${r.getAs[String]("source")}: rate $rate != sqrt(n_min/n) $want")
      if (n == nMin)
        assert(r.getAs[Long]("n_kept") == n, "rate-1.0 source must keep every doc")
      // 12-bit threshold quantization + binomial noise over small sources:
      // realized tracks target loosely but must never exceed-by-much or halve
      val realized = r.getAs[Double]("realized_rate")
      assert(realized >= 0.0 && realized <= 1.0)
    }
    // monotone: a strictly larger source never gets a higher target rate
    val byN = rows.sortBy(_.getAs[Long]("n_total"))
    byN.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("target_rate") >= b.getAs[Double]("target_rate"))
      case _ =>
    }
  }

  test("stratified sample takes exactly min(quota, n) per language, deterministically") {
    val rows = q("k6_stratified_sample").collect()
    val perLang = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    val corpusPerLang = graft.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    corpusPerLang.foreach { case (lang, n) =>
      assert(perLang(lang) === math.min(40L, n).toInt,
        s"$lang: got ${perLang(lang)} of $n (quota 40)")
    }
    // ranks are 1..k dense per stratum
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Int]("pick_rank")).sorted.toSeq === (1 to rs.length),
        s"$lang ranks not dense")
    }
    // deterministic: a second construction picks the identical docs
    val again = q("k6_stratified_sample").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq ===
      again.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("importance sampling separates target-like docs from the raw corpus") {
    val rows = q("k6_importance_sample").collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === docs.size, "every doc is scored")
    val (en, rest) = rows.partition(r => docs(r.getAs[Long]("doc_id")) == "en")
    def keptFrac(rs: Array[org.apache.spark.sql.Row]) =
      rs.count(_.getAs[Boolean]("kept")).toDouble / rs.length
    // target-language docs must score above the raw corpus — the property
    // DSIR selection relies on. The synthetic corpus draws every lang
    // label from ONE shared vocabulary, so the separation is real but
    // modest: assert the ordering, not an absolute margin.
    assert(keptFrac(en) > keptFrac(rest),
      s"en kept ${keptFrac(en)} must exceed non-en kept ${keptFrac(rest)}")
    val meanEn = en.map(_.getAs[Double]("avg_logratio")).sum / en.length
    val meanRest = rest.map(_.getAs[Double]("avg_logratio")).sum / rest.length
    assert(meanEn > meanRest,
      s"target mean $meanEn must exceed raw mean $meanRest")
  }

  test("cross perplexity: OOV stays finite, in-distribution text scores far lower") {
    import spark.implicits._
    val train = Seq((1L, "a b a b a b a b"), (2L, "a b a c a b a c"))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "a b a b a b"), // pure in-distribution bigrams
      (11L, "x y z w q r") // every word and bigram unseen → OOV floor only
    ).toDF("doc_id", "text")
    val out = PipelineQueries.crossPerplexity(train, eval_)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logp"), r.getAs[Double]("ppl"))).toMap
    // interpolation keeps the all-OOV doc finite (the property MLE lacks)
    assert(!out(11L)._1.isNaN && !out(11L)._1.isInfinite)
    assert(out(10L)._2 < out(11L)._2 / 5,
      s"in-distribution ppl ${out(10L)._2} must be far below OOV ppl ${out(11L)._2}")
    // ppl is exp(−avg) of the rounded mean; avg of probabilities < 1 is < 0
    out.values.foreach { case (avg, ppl) =>
      assert(avg < 0 && ppl > 1)
      assert(math.abs(ppl - math.exp(-avg)) < 1e-4)
    }
    // corpus query: every eval-split doc with ≥ 2 tokens is scored
    val rows = q("k4_cross_perplexity").collect()
    val evalDocs = graft.Tables.documents(spark, sfDir)
      .where("doc_id % 4 = 0 AND size(split(text, ' ')) >= 2").count()
    assert(rows.length.toLong === evalDocs)
  }

  test("train/test split partitions the corpus and both splits are populated") {
    val rows = q("k6_split_train_test").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = Tables.documents(spark, sfDir).count()
    assert(total == corpus, "every doc lands in exactly one split")
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits == Set("train", "valid"))
    val valid = rows.filter(_.getAs[String]("split") == "valid")
      .map(_.getAs[Long]("n_docs")).sum
    val rate = valid.toDouble / total
    assert(rate > 0.05 && rate < 0.30, s"~16% expected, got $rate")
  }

  test("mixture sampling realizes rates near the requested per-source weights") {
    val rows = q("k6_mixture_sample").collect()
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val want = src.drop(3).toInt % 4 match {
        case 0 => 0.125; case 1 => 0.25; case 2 => 0.5; case _ => 0.75
      }
      val got = r.getAs[Double]("realized_rate")
      // 25 docs/source at sf0.001 → generous binomial tolerance
      assert(math.abs(got - want) < 0.35, s"$src: want ~$want got $got")
    }
  }

  test("sequence packing: blocks tile each language shard without gaps") {
    val rows = q("k6_pack_sequences").collect()
    assert(rows.forall(r =>
      r.getAs[Long]("first_block") <= r.getAs[Long]("last_block")))
    // per lang: consecutive docs' block ranges must overlap or abut —
    // doc i+1 starts in the block doc i ended in (concat-and-chunk never
    // leaves a hole) unless doc i ended exactly on a boundary.
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, docs) =>
      docs.sortBy(_.getAs[Long]("doc_id")).sliding(2).foreach {
        case Array(a, b) =>
          val gap = b.getAs[Long]("first_block") - a.getAs[Long]("last_block")
          assert(gap == 0 || gap == 1, s"$lang: hole between blocks ($gap)")
        case _ =>
      }
    }
  }

  test("shard shuffle: 16 hex shards, positions contiguous from 1 per shard") {
    val rows = q("k6_shard_shuffle").collect()
    val byShard = rows.groupBy(_.getAs[String]("shard"))
    assert(byShard.keySet.subsetOf("0123456789abcdef".map(_.toString).toSet))
    byShard.values.foreach { docs =>
      val pos = docs.map(_.getAs[Int]("pos")).sorted
      assert(pos.toSeq == (1 to docs.length).toSeq, "rank is a permutation")
    }
    assert(rows.length == Tables.documents(spark, sfDir).count())
  }

  test("tf-idf: corpus-universal words score zero, rare words outrank common ones") {
    val rows = q("k4_tfidf_top_terms").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("tfidf"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "sorted desc")
    rows.foreach { r =>
      val (tf, df) = (r.getAs[Long]("tf"), r.getAs[Long]("df"))
      assert(df <= tf, "doc frequency cannot exceed term frequency")
    }
  }

  test("PMI collocations match a driver-side brute force of the full top-20") {
    val texts = Tables.documents(spark, sfDir).select("text")
      .collect().map(_.getString(0).split(" ", -1).toSeq).filter(_.size >= 2)
    val uni = texts.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = texts.flatMap(w => w.zip(w.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tUni = uni.values.sum.toDouble
    val tBi = bi.values.sum.toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = bi.toSeq.collect { case ((a, b), c) if c >= 5 =>
      (a, b, c, r6(math.log((c / tBi) / ((uni(a) / tUni) * (uni(b) / tUni)))))
    }.sortBy { case (a, b, _, p) => (-p, a, b) }.take(20)
    val got = graft.analytics.TextQueries.queries("k4_pmi_collocations")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected, s"PMI divergence:\n got $got\n exp $expected")
    // sanity on the signal itself: a supported pair of rare words must
    // outrank any pair of corpus-universal words
    assert(got.head._4 > 0, "top collocation must be positively associated")
  }

  test("TextRank keywords match a driver-side brute force of the integer recurrence") {
    val total = 1000000000000L
    val texts = Tables.documents(spark, sfDir).select("text")
      .collect().map(_.getString(0).split(" ", -1).toSeq).filter(_.size >= 2)
    val undirected = texts.flatMap(w => w.zip(w.tail)).filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    val edges = undirected.flatMap { case (x, y) => Seq((x, y), (y, x)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = deg.size
    var rank = deg.map { case (v, _) => v -> total / n }
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => rank(src) / deg(src) }.sum).toMap
      rank = deg.map { case (v, _) =>
        v -> ((15L * (total / n)) / 100 + 85L * in.getOrElse(v, 0L) / 100)
      }
    }
    val expected = rank.toSeq.map { case (w, r) => (w, deg(w), r) }
      .sortBy { case (w, _, r) => (-r, w) }.take(20)
    val got = graft.analytics.TextQueries.queries("k4_textrank_keywords")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"TextRank divergence:\n got $got\n exp $expected")
  }

  test("norm stats: per-label count covers the corpus, min <= avg <= max") {
    val rows = q("k3_norm_stats").collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ==
      Tables.embeddings(spark, sfDir).count())
    rows.foreach { r =>
      val (mn, av, mx) = (r.getAs[Double]("min_norm"),
        r.getAs[Double]("avg_norm"), r.getAs[Double]("max_norm"))
      assert(mn > 0 && mn <= av && av <= mx)
    }
  }

  test("merge upsert: actions partition the key space correctly") {
    val rows = q("c7_merge_upsert").collect()
    val byAction = rows.groupBy(_.getAs[String]("action"))
    // inserted keys are exactly the odd custkeys that placed orders
    byAction.getOrElse("insert", Array()).foreach { r =>
      assert(r.getAs[Long]("custkey") % 2 == 1)
      assert(r.getAs[String]("name") == "(new)")
      assert(r.getAs[Long]("n_orders") > 0)
    }
    byAction.getOrElse("keep", Array()).foreach { r =>
      assert(r.getAs[Long]("n_orders") == 0 && r.getAs[Double]("spend") == 0.0)
    }
    byAction.getOrElse("update", Array()).foreach { r =>
      assert(r.getAs[Long]("custkey") % 2 == 0 && r.getAs[Long]("n_orders") > 0)
    }
    // no key appears twice
    assert(rows.map(_.getAs[Long]("custkey")).distinct.length == rows.length)
  }

  test("incremental agg: folded batches equal the one-shot aggregate exactly") {
    import graft.operators.IncrementalAgg
    val ev = Tables.events(spark, sfDir)
    val folded = q("d6_incremental_agg").collect().map(_.toSeq).toSeq
    val oneShot = IncrementalAgg.partial(ev, Seq("user_id", "event_type"), "value")
      .select(col("user_id"), col("event_type"), col("n"),
        col("total").cast("double").as("total"), col("lo"), col("hi"))
      .orderBy("user_id", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(folded == oneShot)
  }

  test("incremental agg: file-backed state survives repeated refreshes") {
    import graft.operators.IncrementalAgg
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm").toString + "/state"
    val b1 = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "value")
    val b2 = Seq(("a", 4.0), ("c", -1.0)).toDF("k", "value")
    IncrementalAgg.updateTable(spark, dir, b1, Seq("k"), "value")
    val s2 = IncrementalAgg.updateTable(spark, dir, b2, Seq("k"), "value")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue,
        r.getDouble(3), r.getDouble(4)))
    assert(s2.toSeq == Seq(
      ("a", 3L, 7.0, 1.0, 4.0), ("b", 1L, 5.0, 5.0, 5.0), ("c", 1L, -1.0, -1.0, -1.0)))
    // exactly one live version directory remains after the swap
    val live = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("v"))
    assert(live.length == 1)
  }

  test("incremental agg: streaming foreachBatch maintenance equals batch aggregate") {
    import graft.operators.IncrementalAgg
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivm-stream").toString + "/state"
    val in = MemoryStream[(String, Double)]
    val q = in.toDF().toDF("k", "value").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        IncrementalAgg.updateTable(spark, dir, batch, Seq("k"), "value",
          batchId = Some(id)): Unit
      }
      .start()
    try {
      in.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      in.addData(("a", 3.0), ("c", 10.0))
      q.processAllAvailable()
    } finally q.stop()
    // numeric version parse, not lexicographic path max: "v9_b8" > "v10_b9"
    // as strings, so a ≥10-batch run would read a stale version otherwise
    val state = spark.read.parquet(
        new java.io.File(dir).listFiles().map(_.getPath)
          .flatMap(p => "/v(\\d+)".r.findFirstMatchIn(p).map(m => (m.group(1).toLong, p)))
          .maxBy(_._1)._2)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue))
    assert(state.toSeq == Seq(("a", 2L, 4.0), ("b", 1L, 2.0), ("c", 1L, 10.0)))
  }

  test("incremental agg: replaying the same batchId is a no-op (at-least-once safety)") {
    import graft.operators.IncrementalAgg
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm-replay").toString + "/state"
    val b = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "value")
    IncrementalAgg.updateTable(spark, dir, b, Seq("k"), "value", batchId = Some(7L))
    // foreachBatch re-delivery after a driver crash: same id, same data
    val replayed = IncrementalAgg
      .updateTable(spark, dir, b, Seq("k"), "value", batchId = Some(7L))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(replayed.toSeq == Seq(("a", 1L), ("b", 1L)), "counts must not double")
    val next = IncrementalAgg
      .updateTable(spark, dir, b, Seq("k"), "value", batchId = Some(8L))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(next.toSeq == Seq(("a", 2L), ("b", 2L)), "a new batchId merges normally")
  }

  test("salted join equals the plain unsalted join bit-for-bit") {
    val salted = q("c6_join_salted").collect().map(_.toSeq).toSeq
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("repetition ratio matches a driver-side recount on sampled docs") {
    import graft.analytics.TextQueries
    val rows = TextQueries.queries("k4_repetition_ratio")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (_, r) =>
      val top = r.getAs[Double]("top_bigram_frac")
      val dup = r.getAs[Double]("dup_bigram_frac")
      val n = r.getAs[Int]("n_bigrams")
      assert(top > 0 && top <= 1 && dup >= 0 && dup < 1 && n >= 1)
    }
    // independent scalar recount for a deterministic sample
    docs.toSeq.sortBy(_._1).take(10).foreach { case (id, text) =>
      val w = text.split(" ", -1)
      if (w.length >= 2) {
        val bg = w.sliding(2).map(_.mkString(" ")).toSeq
        val mode = bg.groupBy(identity).values.map(_.size).max
        val r = rows(id)
        assert(r.getAs[Int]("n_bigrams") == bg.size)
        assert(math.abs(r.getAs[Double]("top_bigram_frac") - mode.toDouble / bg.size) < 1e-6)
        assert(math.abs(r.getAs[Double]("dup_bigram_frac") -
          (1.0 - bg.distinct.size.toDouble / bg.size)) < 1e-6)
      }
    }
  }

  test("filter cascade is a consistent funnel over the whole corpus") {
    import graft.analytics.TextQueries
    val rows = TextQueries.queries("k4_filter_cascade")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.map(_.getAs[String]("filter")).toSeq ==
      Seq("min_words", "avg_word_len", "stopword_ratio", "repetition"))
    assert(rows.head.getAs[Long]("n_in") == Tables.documents(spark, sfDir).count(),
      "stage 1 sees the whole corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_dropped") == r.getAs[Long]("n_out"))
      assert(r.getAs[Long]("n_dropped") >= 0)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_out") == b.getAs[Long]("n_in"), "stages chain")
    }
    assert(rows.last.getAs[Long]("n_out") > 0, "the cascade must admit documents")
  }

  test("streaming quality gates + incremental maintenance equal the batch funnel") {
    import graft.analytics.TextQueries
    import graft.operators.IncrementalAgg
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("gate-stream").toString + "/state"
    // independent re-derivation of the split assignment (the query helper
    // is deliberately private)
    val split = when(substring(md5(concat(lit("split42:"),
      col("doc_id").cast("string"))), 1, 2) < "29", lit("valid")).otherwise(lit("train"))
    def admitted(df: org.apache.spark.sql.DataFrame) =
      TextQueries.qualityGates.foldLeft(TextQueries.qualitySignals(df)) {
        case (d, (_, g)) => d.filter(g)
      }
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect()
    val in = MemoryStream[(Long, String, String, String, Long)]
    val q = in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        IncrementalAgg.updateTable(spark, dir,
          admitted(batch)
            .select(concat_ws("|", split, col("lang")).as("k"),
              col("nw").cast("double").as("value")),
          Seq("k"), "value", batchId = Some(id)): Unit
      }.start()
    try {
      docs.grouped(docs.length / 3 + 1).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val state = spark.read.parquet(
        new java.io.File(dir).listFiles().map(_.getPath)
          .flatMap(p => "/v(\\d+)".r.findFirstMatchIn(p).map(m => (m.group(1).toLong, p)))
          .maxBy(_._1)._2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue)).toMap
    val expected = admitted(Tables.documents(spark, sfDir))
      .groupBy(concat_ws("|", split, col("lang")).as("k"))
      .agg(count(lit(1)).as("n"), sum(col("nw").cast("double")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(state == expected,
      s"3-batch streaming maintenance must equal the one-shot batch funnel: $state vs $expected")
  }

  test("corpus pipeline admits exactly the gated dedup survivors") {
    import graft.analytics.TextQueries
    val rows = q("k6_corpus_pipeline").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "valid")))
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    // independent recount via the groupBy-min dedup formulation (the query
    // itself uses a window), then the same gates
    val docs = Tables.documents(spark, sfDir)
    val survivorIds = docs.groupBy("text")
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val gated = TextQueries.qualityGates.foldLeft(
      TextQueries.qualitySignals(docs.join(survivorIds, "doc_id"))) {
      case (df, (_, gate)) => df.filter(gate)
    }.count()
    assert(total == gated, s"pipeline admitted $total, recount says $gated")
    assert(total <= docs.count())
  }

  test("doc LM score: corpus-built LM loses no bigram and scores are log-probs") {
    val rows = q("k4_doc_lm_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_logp") <= 0.0, "log of p<=1 is non-positive")
      assert(r.getAs[Long]("n_bigrams") >= 1)
    }
    // the LM is built from the same corpus → every doc bigram is in-vocab,
    // so the join drops nothing: per-doc n_bigrams == len(tokens) - 1
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).as("nb"))
      .filter(col("nb") >= 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("nb")).toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == expected(r.getAs[Long]("doc_id")).toLong)
    }
  }

  test("source quality report: conserves the corpus and agrees with the gate recount") {
    val rows = graft.analytics.TextQueries.queries("k4_source_quality")(spark, sfDir)
      .collect()
    val docs = Tables.documents(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_pass") <= nd)
      val rate = r.getAs[Double]("pass_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Double]("avg_tokens") > 0.0)
    }
    // total passers across sources == the cascade's final-stage output
    val cascadeOut = graft.analytics.TextQueries.queries("k4_filter_cascade")(spark, sfDir)
      .filter(col("stage") === 4).head().getAs[Long]("n_out")
    assert(rows.map(_.getAs[Long]("n_pass")).sum == cascadeOut,
      "per-source passers must sum to the cascade's stage-4 survivors")
  }

  test("epoch schedule: integer repeat plan honors the 4-epoch cap and the budget split") {
    val rows = q("k6_epoch_schedule").collect()
    assert(rows.nonEmpty)
    val budgetPerSource = rows.head.getAs[Long]("target_tokens")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val target = r.getAs[Long]("target_tokens")
      val epochs = r.getAs[Long]("epochs")
      val served = r.getAs[Long]("served_tokens")
      val shortfall = r.getAs[Long]("shortfall")
      assert(target == budgetPerSource, "uniform split: same target everywhere")
      assert(epochs >= 1 && epochs <= 4, s"epochs out of [1,4]: $epochs")
      assert(served == math.min(target, 4 * n))
      assert(shortfall == target - served && shortfall >= 0)
      // the cap binds exactly when 4 full passes cannot reach the target
      assert((epochs == 4 && 4 * n <= target) == (shortfall > 0) ||
        (epochs == 4 && 4 * n > target && shortfall == 0) || epochs < 4,
        s"cap/shortfall inconsistent: n=$n target=$target epochs=$epochs")
    }
  }

  test("containment: a fully-quoted doc scores 1.0 toward its superset, jaccard would not") {
    import spark.implicits._
    // build a tiny frame and run the same operator shapes the query uses
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + "eta theta iota kappa lambda mu nu xi omicron " +
      "pi rho sigma tau upsilon phi chi psi omega one two three four five six"
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    import graft.functions.VectorFunctions.shingles
    val sh = docs.select(col("doc_id"), shingles(split(col("text"), " "), 3).as("sh"))
    val got = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") === 1L && col("b.doc_id") === 2L)
      .select(
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double")
          / size(col("a.sh")).cast("double")).as("containment"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double")
          / size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("jaccard"))
      .head()
    assert(got.getDouble(0) == 1.0, s"small doc fully contained: $got")
    assert(got.getDouble(1) < 0.5, s"jaccard must wash out under size mismatch: $got")
  }

  test("source overlap: pairs are ordered, counted symmetrically, and key-consistent") {
    val rows = graft.analytics.TextQueries.queries("k2_source_overlap")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "sf0.001 plants cross-source prefix dups")
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"),
        "pair must be strictly ordered (each unordered pair appears once)")
      assert(r.getAs[Long]("n_shared_keys") >= 1)
    }
    // ground truth by brute force on the tiny SF: distinct (source, key)
    // rows joined on key. maxBucket=64 > 20 sources, so no block drops.
    val keyed: Seq[(String, String)] = Tables.documents(spark, sfDir)
      .select(col("source"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("k"))
      .distinct().collect().toSeq
      .map(r => (r.getString(0), r.getString(1)))
    val pairs: Seq[(String, String)] = keyed.groupBy(_._2).valuesIterator.flatMap { g =>
      val srcs = g.map(_._1).distinct.sorted
      for (a <- srcs; b <- srcs if a < b) yield (a, b)
    }.toSeq
    val expected: Set[(String, String, Long)] =
      pairs.groupBy(identity).iterator
        .map { case ((a, b), v) => (a, b, v.size.toLong) }.toSet
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      == expected)
  }

  test("boilerplate prefix: top-1 with tiebreak matches a driver-side recount") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).take(5).mkString(" ")))
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val byPfx = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      // highest count, ties to the lexicographically smallest prefix
      val (topPfx, topCnt) = byPfx.toSeq.minBy { case (p, c) => (-c, p) }
      src -> (rows.length.toLong, byPfx.size.toLong, topPfx, topCnt)
    }
    val got = graft.analytics.TextQueries.queries("k4_boilerplate")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (src, (nDocs, nPfx, topPfx, topCnt)) =>
      val (gn, gp, gtp, gtc, gshare) = got(src)
      assert((gn, gp, gtp, gtc) == ((nDocs, nPfx, topPfx, topCnt)), s"source $src")
      assert(math.abs(gshare - topCnt.toDouble / nDocs) < 1e-6)
    }
  }

  test("chunk overlap: windows tile every document with exact stride/overlap") {
    val rows = q("k6_chunk_overlap").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    val nTokens = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet == nTokens.keySet, "every non-null doc chunks")
    byDoc.foreach { case (doc, cs) =>
      val n = nTokens(doc)
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      assert(sorted.length == math.ceil(n / 96.0).toLong,
        s"doc $doc: ${sorted.length} chunks for $n tokens at stride 96")
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("start_tok") == 96L * i, "starts advance by the stride")
        assert(c.getAs[Long]("chunk_len") == math.min(128L, n - 96L * i),
          "window length = min(win, remaining)")
      }
      // coverage: consecutive windows overlap by win - stride = 32 tokens
      // (or tail-truncated), so the last token of every doc is inside the
      // final window
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("chunk_len") == n,
        "final window ends exactly at the document's last token")
    }
  }

  test("length deciles: monotone boundaries that cover exactly the promised mass") {
    val rows = graft.analytics.TextQueries.queries("k4_length_deciles")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("decile"), r.getAs[Long]("boundary")))
    assert(rows.map(_._1).toSeq == (1L to 9L))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq,
      "boundaries must be monotone")
    val lens = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long")).collect()
      .map(_.getLong(0)).sorted
    val n = lens.length
    rows.foreach { case (d, b) =>
      val covered = lens.count(_ <= b)
      assert(covered >= math.ceil(d * n / 10.0).toLong,
        s"decile $d boundary $b must cover >= ${d * 10}% of docs")
      // minimality: the previous distinct length covers strictly less
      val below = lens.filter(_ < b)
      assert(below.isEmpty || below.length < math.ceil(d * n / 10.0),
        s"decile $d boundary $b is not the smallest qualifying length")
    }
  }

  test("c10_cdc_apply: tombstones remove, last writer wins, untouched base passes through") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("c10_cdc_apply")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(_._1)
    assert(byKey.values.forall(_.length == 1), "one row per surviving key")
    // replay the rules driver-side on the raw tables
    val base = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 3 === 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val lastOp = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    lastOp.foreach { case (k, seq) =>
      val deleted = seq % 5 == 0
      val present = byKey.contains(k)
      assert(present == !deleted,
        s"key $k: last op ${if (deleted) "D" else "U"} but present=$present")
    }
    base.filter(!lastOp.contains(_)).foreach { k =>
      assert(byKey(k).head._4 == "base", s"untouched base key $k not passed through")
    }
    rows.filter(_._4 == "insert").foreach { case (k, name, _, _) =>
      assert(!base.contains(k) && name == "(inserted)")
    }
  }
}

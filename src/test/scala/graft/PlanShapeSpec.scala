package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-design assertions: these check the PLAN, not the answer — the
  * properties that decide whether an operator survives a 100× scale-up
  * (pushdown reaching parquet, broadcast joins where intended, and no
  * cartesian product anywhere near the LSH dedup path).
  */
class PlanShapeSpec extends SparkSpec {

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** All parquet scans in an executed plan, descending through AQE's
    * stage wrappers (AdaptiveSparkPlanExec / QueryStageExec hold their
    * subtree as a field, not a child, so a plain collect misses them).
    */
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other =>
      other.children.flatMap(fileScans) ++ other.subqueries.flatMap(fileScans)
  }

  test("filter + projection push down to the parquet scan (a8)") {
    val plan = physicalPlan(
      analytics.StarQueries.queries("a8_scan_project")(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
    assert(!plan.contains("l_comment"), "unprojected column read from parquet")
  }

  test("dimension join broadcasts the small side (c6 inner)") {
    val plan = physicalPlan(
      analytics.StarQueries.queries("c6_join_inner")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort (f3)") {
    val plan = physicalPlan(
      analytics.StarQueries.queries("f3_topk")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not fused:\n$plan")
  }

  test("IVF probe over a written _list layout prunes to nProbe partition directories") {
    import graft.operators.IvfAnn
    val emb = Tables.embeddings(spark, sfDir)
    val nLists = 8
    val nProbe = 2
    val centroids = IvfAnn.trainCentroids(emb, "embedding", "vec_id", 64, nLists)
    val dir = java.nio.file.Files.createTempDirectory("ivfplan").toString + "/idx"
    IvfAnn.writeIndex(emb, "embedding", centroids, dir)
    val q = IvfAnn.index(emb, "embedding", centroids)
      .filter(col("vec_id") === 0L).select("_v").head().getSeq[Double](0).toArray

    val topk = IvfAnn.probeTopK(spark.read.parquet(dir), "vec_id", q,
      centroids, k = 10, nProbe = nProbe)
    topk.collect() // finalize the adaptive plan and populate scan metrics
    val scan = fileScans(topk.queryExecution.executedPlan)
      .find(_.toString.contains("_list"))
      .getOrElse(fail(s"no partitioned scan in plan:\n${topk.queryExecution.executedPlan}"))
    // the cell filter must be a PARTITION filter (directory pruning), not a
    // post-scan data filter — at 100 TB that is the entire point of IVF
    assert(scan.toString.contains("PartitionFilters: [_list"),
      s"_list filter not applied at partition level:\n$scan")
    val read = scan.metrics("numPartitions").value
    assert(read == nProbe,
      s"scan read $read partition directories, expected exactly nProbe=$nProbe of $nLists")
  }

  test("minhash LSH dedup plan contains no cartesian/broadcast-nested-loop join") {
    val plan = physicalPlan(
      Dedup.minHashLsh(Tables.documents(spark, sfDir), "text", "doc_id"))
    assert(!plan.contains("CartesianProduct"), s"cartesian in LSH plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in LSH plan:\n$plan")
  }

  test("cosine top-k broadcasts the one-row query vector (k3)") {
    val plan = physicalPlan(
      analytics.SimilarityQueries.queries("k3_cosine_topk")(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query vector not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not fused:\n$plan")
  }

  test("normalizer is shuffle-free: no exchange before the union output") {
    val bronze = analytics.LedgerQueries.fixtureBronze(spark)
    val plan = physicalPlan(normalize.SolanaNormalizer.normalize(bronze))
    assert(!plan.contains("Exchange"), s"normalizer shuffles:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"normalizer joins (pre/post correlation must stay array-local):\n$plan")
  }

  test("normalizer parses each row's JSON exactly once (single-pass invariant)") {
    // Must be a non-local input: local fixture relations get the parse
    // constant-folded at plan time and from_json vanishes from the plan.
    val bronze = analytics.LedgerQueries.eventsAsBronze(spark, sfDir)
    val plan = physicalPlan(normalize.SolanaNormalizer.normalize(bronze))
    val parses = "from_json".r.findAllIn(plan).length
    assert(parses == 1,
      s"expected exactly 1 from_json in the physical plan, saw $parses " +
        s"(a union-of-branches formulation re-parses per branch):\n$plan")
  }

  test("h15 map suite parses props once: field projection stays above the sort") {
    val plan = physicalPlan(
      analytics.EventQueries.queries("h15_map_funcs")(spark, sfDir))
    val parses = "from_json".r.findAllIn(plan).length
    assert(parses == 1,
      s"expected 1 from_json, saw $parses (CollapseProject crossed the " +
        s"Sort barrier and re-inlined the parse per output column):\n$plan")
  }

  test("idempotent sink anti-join broadcasts the incoming batch, never shuffles the table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan").toString + "/t"
    Tables.events(spark, sfDir).select($"event_id", $"value")
      .write.parquet(dir)
    val batch = Seq((1L, 0.5), (-5L, 0.5)).toDF("event_id", "value")
    val plan = physicalPlan(
      operators.IdempotentSink.dedupeAgainstExisting(spark, batch, dir, "event_id"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"batch keys not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"existing table shuffled for the key probe:\n$plan")
  }

  test("batch ANN is an equi-join on the bucket id — no cartesian/BNLJ") {
    val plan = physicalPlan(
      analytics.SimilarityQueries.annTopKBatch(
        Tables.embeddings(spark, sfDir), col("vec_id") < 8, dim = 64, k = 10))
    assert(!plan.contains("CartesianProduct"), s"cartesian in batch-ANN plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in batch-ANN plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"),
      s"probe→corpus bucket join is not an equi hash/merge join:\n$plan")
  }

  test("bucketed fact-fact join plans without a shuffle on either side") {
    import graft.operators.BucketedTables
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick SMJ — the shape under test
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      BucketedTables.writeBucketed(
        Tables.orders(spark, sfDir), "orders_b", s"$dir/orders_b", "o_custkey", 4)
      BucketedTables.writeBucketed(
        Tables.customer(spark, sfDir).selectExpr("c_custkey", "c_name"),
        "customer_b", s"$dir/customer_b", "c_custkey", 4)
      val joined = BucketedTables.readBucketed(spark, "orders_b")
        .join(BucketedTables.readBucketed(spark, "customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = physicalPlan(joined)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle (bucketed scans satisfy the distribution):\n$plan")
      // sanity: same row count as the plain-path join
      val expected = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.count() == expected)
      // and the shape must survive AQE's runtime re-planning too
      val fin = finalPlan(joined)
      assert(fin.contains("SortMergeJoin") && !fin.contains("Exchange"),
        s"bucketed zero-exchange join degraded in the AQE final plan:\n$fin")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  /** Shuffle nodes in the QUERY's own plan: descends AQE wrappers, stops
    * at InMemoryTableScan (a cached subtree's internal shuffles were paid
    * once at materialization, not per consumer).
    */
  private def shuffleCount(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      shuffleCount(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      shuffleCount(q.plan)
    case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
      1 + s.children.map(shuffleCount).sum
    case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => 0
    case other => other.children.map(shuffleCount).sum
  }

  test("plain PageRank: cached co-partitioning leaves only the gather + presentation exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val r = analytics.GraphQueries.queries("g4_pagerank")(spark, sfDir)
      val n = shuffleCount(r.queryExecution.executedPlan)
      // budget: 3 gather shuffles (groupBy dst, one per iteration) + the
      // final presentation orderBy's rangepartitioning. The scatter join
      // and rank-update join must be satisfied by the persisted
      // repartition(src) — InMemoryRelation preserves outputPartitioning
      // where the old localCheckpoint shape lost it (3 shuffles/iter).
      assert(n <= 4,
        s"persist-shaped plain PageRank must not re-exchange the edge " +
          s"list per iteration, saw $n shuffles:\n${physicalPlan(r)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed PageRank: one exchange per iteration (gather only) — scatter joins layout-satisfied") {
    val dir = java.nio.file.Files.createTempDirectory("pr-bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so every join must honor distributions — the
      // shape under test is the co-partitioned SMJ/SHJ, not a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val edges = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("C"), col("o_custkey")).as("c"),
          concat(lit("S"), col("l_suppkey")).as("p"))
        .distinct()
      val both = edges.select(col("c").as("src"), col("p").as("dst"))
        .unionAll(edges.select(col("p").as("src"), col("c").as("dst")))
      val r = analytics.GraphQueries.pagerankBucketed(spark, both, dir, iterations = 3)
      val plan = physicalPlan(r)
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 3,
        s"bucketed 3-iteration PageRank must shuffle exactly once per " +
          s"iteration (the gather), saw $exchanges:\n$plan")
      // and the result matches the checkpointed-path query bit-for-bit
      val viaQuery = analytics.GraphQueries.queries("g4_pagerank")(spark, sfDir)
        .select("node", "degree", "rank_ppt")
      assert(r.select(col("node"), col("deg").as("degree"),
          col("rank").as("rank_ppt"))
        .exceptAll(viaQuery).isEmpty && viaQuery.exceptAll(
          r.select(col("node"), col("deg").as("degree"),
            col("rank").as("rank_ppt"))).isEmpty,
        "bucketed and checkpointed PageRank diverged")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_pr_edges_b")
      spark.sql("DROP TABLE IF EXISTS graft_pr_deg_b")
    }
  }

  test("durable PageRank iterate: one exchange per step, bit-equal to the unrolled iterate, resumable mid-run") {
    val dir = java.nio.file.Files.createTempDirectory("pr-durable").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val edges = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("C"), col("o_custkey")).as("c"),
          concat(lit("S"), col("l_suppkey")).as("p"))
        .distinct()
      val both = edges.select(col("c").as("src"), col("p").as("dst"))
        .unionAll(edges.select(col("p").as("src"), col("c").as("dst")))
      analytics.GraphQueries.writePagerankLayout(spark, both, dir)
      def key(df: DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val unrolled3 = key(analytics.GraphQueries.pagerankOnLayout(spark, 3))
      val durable3 = key(analytics.GraphQueries.pagerankIterateDurable(spark, dir, 3))
      assert(durable3 == unrolled3,
        "per-iteration durable spill must not change the rank recurrence")
      // kill-and-resume: run 2 iterations, then resume 2→3 from the
      // written generation — must land on the same ranks
      analytics.GraphQueries.pagerankIterateDurable(spark, dir, 2)
      val resumed3 = key(analytics.GraphQueries.pagerankIterateDurable(
        spark, dir, 3, startIteration = 2))
      assert(resumed3 == unrolled3,
        "resuming from a durable generation must equal the straight run")
      // the step plan: exactly ONE Exchange (the gather) — scatter join,
      // rank update, and the bucketed write are layout-satisfied
      val step = analytics.GraphQueries.durableRankStep(
        spark, "graft_pr_ranks_even", teleport = 1L)
      val plan = physicalPlan(step)
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"a durable iteration must shuffle exactly once (the gather), saw $exchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("graft_pr_edges_b", "graft_pr_deg_b",
        "graft_pr_ranks_even", "graft_pr_ranks_odd")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("AQE skew-join splits byte-skew once thresholds are met — and why c6_join_salted still salts by hand") {
    // Evidence for the manual salt in c6_join_salted, not habit: AQE's
    // OptimizeSkewedJoin is a BYTE-threshold mechanism on shuffle-join
    // stages. A partition is split only when its map-output size exceeds
    // max(skewedPartitionThresholdInBytes [256 MB default],
    //     skewedPartitionFactor × median). Consequences at scale:
    //   (a) a hot key whose cost is COMPUTE (wide rows exploded later, an
    //       expensive verify) but whose bytes sit under the threshold gets
    //       no relief — the salt spreads it regardless;
    //   (b) AQE acts at runtime per query; the salt is a deterministic
    //       plan property you can assert, bucket, and reason about.
    // Both halves demonstrated on the same synthetic skew (90% of fact
    // rows on one key):
    val skewConfs = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = skewConfs.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val fact = spark.range(150000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 5000).as("k"),
        col("id").as("payload"))
      val dim = spark.range(5000).select(col("id").as("k"), (col("id") * 2).as("attr"))
      def joined = fact.join(dim, "k").select(col("k"), col("payload"), col("attr"))
      // (1) default thresholds: the hot partition is a few MB — two orders
      // of magnitude under 256 MB, so AQE leaves the straggler whole
      val p1 = finalPlan(joined)
      assert(p1.contains("SortMergeJoin") || p1.contains("ShuffledHashJoin"),
        s"skew evidence needs the shuffle-join regime:\n$p1")
      assert(!p1.contains("skew=true"),
        s"under default byte thresholds this corpus must NOT trigger a split:\n$p1")
      // (2) thresholds at this corpus's scale: AQE now splits the hot
      // partition — the mechanism is real, it just keys on bytes
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      val p2 = finalPlan(joined)
      assert(p2.contains("skew=true"),
        s"lowered thresholds must split the hot partition:\n$p2")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join stays in the shuffle regime: no broadcast of the replicated dim") {
    val plan = physicalPlan(
      analytics.PipelineQueries.queries("c6_join_salted")(spark, sfDir))
    assert(plan.contains("ShuffledHashJoin"),
      s"salted join must be a shuffled hash join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"16x-replicated dimension got broadcast (pre-explode size estimate trap):\n$plan")
  }

  /** The FINAL adaptive plan after execution — AQE re-plans at runtime
    * (stage coalescing, skew splitting, join-strategy switches), and a
    * 100× cluster runs with it enabled, so the scale shapes must hold in
    * what actually EXECUTED, not just the static plan the other tests
    * read. (`spark.sql.adaptive.enabled` defaults to true on Spark 4; the
    * session leaves it on.)
    */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("isFinalPlan=true")
      || !df.queryExecution.executedPlan.toString.contains("AdaptiveSparkPlan"),
      "expected the adaptive plan to be finalized after an action")
    df.queryExecution.executedPlan.toString
  }

  test("AQE final plans keep the asserted shapes (salted c6, banded c8, LSH k2)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")

    val salted = analytics.PipelineQueries.queries("c6_join_salted")(spark, sfDir)
    val saltedPlan = finalPlan(salted)
    assert(saltedPlan.contains("ShuffledHashJoin"),
      s"AQE switched the salted join away from shuffle-hash:\n$saltedPlan")
    assert(!saltedPlan.contains("BroadcastHashJoin"),
      s"AQE broadcast the 16x-replicated dimension:\n$saltedPlan")

    val range = analytics.PipelineQueries.queries("c8_range_join")(spark, sfDir)
    val rangePlan = finalPlan(range)
    assert(!rangePlan.contains("CartesianProduct") &&
      !rangePlan.contains("BroadcastNestedLoopJoin"),
      s"AQE degraded the banded range join:\n$rangePlan")

    val lsh = Dedup.minHashLsh(Tables.documents(spark, sfDir), "text", "doc_id")
    val lshPlan = finalPlan(lsh)
    assert(!lshPlan.contains("CartesianProduct") &&
      !lshPlan.contains("BroadcastNestedLoopJoin"),
      s"AQE degraded the LSH candidate join:\n$lshPlan")
  }

  test("k6 pipeline ops are one scan + hash aggregate / per-shard window — at most one shuffle each") {
    Seq("k6_split_train_test", "k6_mixture_sample").foreach { name =>
      val plan = physicalPlan(analytics.PipelineQueries.queries(name)(spark, sfDir))
      assert(!plan.contains("Join"), s"$name joins:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges <= 1, s"$name: expected ≤1 shuffle, saw $exchanges:\n$plan")
    }
    // packing + sharding windows run per shard key, never a global order:
    // a Window node with an EMPTY partition spec would collapse the whole
    // corpus onto one task.
    Seq("k6_pack_sequences", "k6_shard_shuffle").foreach { name =>
      val plan = physicalPlan(analytics.PipelineQueries.queries(name)(spark, sfDir))
      val globalWindow = """Window \[[^\]]*\], \[\], \[""".r.findFirstIn(plan)
      assert(globalWindow.isEmpty,
        s"$name: window has an empty partition spec (global order):\n$plan")
    }
  }

  test("incremental-agg merge joins state and delta on the keys — no cartesian/BNLJ") {
    val plan = physicalPlan(
      analytics.PipelineQueries.queries("d6_incremental_agg")(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in the merge:\n$plan")
  }

  test("banded range join plans as an equi-join on (bucket, key) — no cartesian/BNLJ") {
    val plan = physicalPlan(
      analytics.PipelineQueries.queries("c8_range_join")(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$plan")
  }

  test("e1 running window: single shuffle on the partition key") {
    val plan = physicalPlan(
      analytics.StarQueries.queries("e1_running_sum")(spark, sfDir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"running-sum should shuffle once, saw $exchanges:\n$plan")
  }

  test("repetition ratio is array-local: zero hash shuffles (k4)") {
    val plan = physicalPlan(
      analytics.TextQueries.queries("k4_repetition_ratio")(spark, sfDir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 0,
      s"bigram metrics must stay inside their row, saw $exchanges shuffles:\n$plan")
  }

  test("filter cascade is one scan + one global aggregate (k4)") {
    val df = analytics.TextQueries.queries("k4_filter_cascade")(spark, sfDir)
    val plan = physicalPlan(df)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"cascade must compute all gates in ONE pass, saw $scans scans:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"a global aggregate needs only a SinglePartition exchange:\n$plan")
  }

  test("span removal: two span-subtree evaluations, keyed shuffles only, no window (k2)") {
    val plan = physicalPlan(
      analytics.TextQueries.queries("k2_span_removal")(spark, sfDir))
    // occurrence build + probe — the self-aggregation-join shape; a THIRD
    // scan would mean the n_tokens recovery regressed to a re-tokenize
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2,
      s"span removal must evaluate the span subtree exactly twice, saw $scans scans:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3,
      s"span removal grew extra shuffles, saw $exchanges:\n$plan")
    assert(!plan.contains("Window"),
      s"the interval union must fold array-local, not via a window:\n$plan")
  }

  test("semantic dedup: in-expression centroid assignment, no cartesian/BNLJ (k2)") {
    val plan = physicalPlan(
      analytics.SimilarityQueries.queries("k2_semantic_dedup")(spark, sfDir))
    assert(plan.contains("nearest_centroid"),
      s"assignment must ride NearestCentroidExpr (no n*k row term):\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"corpus-side cartesian/BNLJ in semantic dedup:\n$plan")
  }

  test("doc LM score joins on the bigram key — no cartesian/BNLJ (k4)") {
    val plan = physicalPlan(
      analytics.PipelineQueries.queries("k4_doc_lm_score")(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"LM join degenerated to a nested loop:\n$plan")
  }

  test("prefix-filter join: keyed joins only, and NO single-partition window (no global row_number)") {
    import org.apache.spark.sql.functions.{array_distinct, col, split}
    val plan = physicalPlan(
      Dedup.prefixFilterJoinSets(Tables.documents(spark, sfDir),
        array_distinct(split(col("text"), " ")), "doc_id", 0.6))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join degenerated to a nested loop:\n$plan")
    // the rarest-first order must live as a PER-DOC window, never a
    // global one — a Window over SinglePartition would serialize the
    // vocabulary at corpus scale (the keyed row_number is the round-11
    // prefixRelation shape; see its scaladoc for the measured win)
    val windowLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("_id")),
      s"prefix join must window PER DOC (_id-keyed), found:\n${windowLines.mkString("\n")}")
  }

  test("weighted all-pairs cosine: keyed joins, keyed window only, dot walk inline (k2)") {
    import org.apache.spark.sql.functions.{array_distinct, col, split}
    val plan = physicalPlan(
      Dedup.allPairsCosine(Tables.documents(spark, sfDir),
        array_distinct(split(col("text"), " ")), "doc_id", 0.8))
    // the ONE nested-loop node allowed is the one-row corpus-count N
    // broadcast (idf); anything else is a degenerated candidate join
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(!plan.contains("CartesianProduct") && bnlj <= 1,
      s"cosine join degenerated to a nested loop:\n$plan")
    // the maxweight tail bound (and the prefix rank) run per doc — a
    // Window over SinglePartition would serialize the corpus
    val windowLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.forall(_.contains("_id")),
      s"cosine join must window PER DOC (_id-keyed), found:\n${windowLines.mkString("\n")}")
    // verification is the inline merge walk, not an array_intersect or a
    // post-join array attach
    assert(plan.contains("sorted_key_dot"),
      s"inline dot walk missing from the plan:\n$plan")
  }

  test("IVF-ADC over the written layout: probe prunes partitions, ADC reads codes not vectors") {
    import graft.operators.{IvfAnn, PqAnn}
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    val cents = IvfAnn.trainCentroids(emb, "embedding", "vec_id", 64, nLists = 8)
    val cbs = PqAnn.trainCodebooks(emb, "embedding", "vec_id", 64, m = 8, k = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfadc_plan").toString + "/idx"
    PqAnn.writeIvfAdcIndex(emb, "embedding", cents, cbs, dir)
    val coded = PqAnn.readIvfAdcIndex(spark, dir, m = 8)
    val q = coded.filter(col("vec_id") === 0L)
      .select("_v").head().getSeq[Double](0).toArray
    // the ADC shortlist BEFORE rerank: its scan must touch only the
    // probed _list directories, and the unpacked code view must still
    // prune the scan to (id, packed word) — not the vector column
    val probes = IvfAnn.nearestProbes(q, cents, 2)
    val short = coded
      .filter(col("_list").isin(probes.map(Integer.valueOf): _*))
      .select(col("vec_id"), col("_c0"))
    val scan = fileScans(short.queryExecution.executedPlan)
      .headOption.getOrElse(fail("no file scan in ADC plan"))
    val parts = scan.metadata.get("PartitionFilters").getOrElse("")
    assert(parts.contains("_list"),
      s"probe filter not a partition filter: ${scan.metadata}")
    // column pruning: the code projection reads the ONE packed word, not
    // the vector column — the "m bytes per touched row" lever at rest
    val readSchema = scan.metadata.get("ReadSchema").getOrElse("")
    assert(readSchema.contains("_codes0") && !readSchema.contains("_v"),
      s"ADC code read not pruned to the packed word: $readSchema")
  }

  test("runtime bloom-filter join pruning: Catalyst injects a might_contain probe on the fact side") {
    // The 100 TB lever behind selective fact⋈dim joins: the optimizer
    // builds a bloom filter from the (filtered) dimension's join keys at
    // runtime and probes it on the fact side BEFORE the shuffle, so rows
    // that cannot match never leave the scan stage. Thresholds are
    // forced here so the sf0.001 tables qualify; results must be
    // IDENTICAL with and without the filter (it only prunes non-matches).
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    def joined() = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // disable broadcast so the join is shuffle-shaped — the case the
      // runtime filter exists for (broadcast joins already prune via DPP)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val withFilter = joined()
      val plan = withFilter.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n${plan.take(2000)}")
      val got = withFilter.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expect = joined().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, "bloom pruning changed the result")
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}

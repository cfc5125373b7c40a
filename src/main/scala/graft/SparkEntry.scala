package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{EventQueries, LedgerQueries, SimilarityQueries, StarQueries, TextQueries}
import graft.operators.MultimodalPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared in [[queries]];
  * SQL-expressible ones carry a DuckDB oracle in [[oracleSql]] (same column
  * names, total ORDER BY, decimal-exact float aggregation — see
  * StarQueries scaladoc for the determinism contract).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Fact-fact join + broadcast dimension + grouped decimal aggregate —
    * exercises scan, join planning, partial aggregation, and ordering.
    */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.queries("c6_join_inner")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    StarQueries.queries ++
      EventQueries.queries ++
      LedgerQueries.queries ++
      TextQueries.queries ++
      SimilarityQueries.queries ++
      Map[String, (SparkSession, String) => DataFrame](
        // K5 typed pipeline: binary payload → batch feature extraction
        // (stubbed decode; rows-only check, asserted in MultimodalSpec).
        "k5_media_features" -> ((s, d) => MultimodalPipeline.featuresQuery(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (seeded-hash LSH, approx sketches, typed pipelines) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    StarQueries.oracle ++
      EventQueries.oracle ++
      LedgerQueries.oracle ++
      TextQueries.oracle ++
      SimilarityQueries.oracle
}

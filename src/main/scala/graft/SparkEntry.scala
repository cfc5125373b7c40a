package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{EventQueries, GraphQueries, LedgerQueries, PipelineQueries, SimilarityQueries, StarQueries, StreamingReplay, TextQueries}
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
      PipelineQueries.queries ++
      GraphQueries.queries ++
      StreamingReplay.queries ++
      Map[String, (SparkSession, String) => DataFrame](
        // K5 typed pipeline: binary payload → batch feature extraction
        // (stubbed decode — deterministic, so oracled despite running
        // through mapPartitions).
        "k5_media_features" -> ((s, d) => MultimodalPipeline.featuresQuery(s, d)),

        // K5 resize: bounding-box clamp of the decoded dimensions (typed
        // Dataset map over the stub features).
        "k5_resize" -> ((s, d) => {
          MultimodalPipeline.resize(
              MultimodalPipeline.extractFeatures(
                MultimodalPipeline.mediaFromDocuments(s, d)),
              maxW = 256, maxH = 256)
            .toDF()
            .select("media_id", "modality", "width", "height")
            .orderBy("media_id")
        }),

        // K5 frame sampling: the generator shape of a frame extractor —
        // one row per sampled frame of video records, frame 0 otherwise.
        "k5_frame_sample" -> ((s, d) => {
          MultimodalPipeline.sampleFrames(
              MultimodalPipeline.extractFeatures(
                MultimodalPipeline.mediaFromDocuments(s, d)),
              everyN = 30)
            .toDF()
            .orderBy("media_id", "frame_idx")
        }))

  /** DuckDB re-derivation of [[MultimodalPipeline.decodeStub]]: u16 words
    * read from the hex digest (per-nibble `strpos('0123…f', c)−1` — this
    * DuckDB build has no hex→int cast). Shared CTE for the K5 oracles.
    */
  private def mediaCte: String = {
    def u16(firstChar: Int): String =
      (0 until 4).map(j =>
        s"(strpos('0123456789abcdef', hx[${firstChar + j}]) - 1) * ${1 << (4 * (3 - j))}")
        .mkString(" + ")
    s"""WITH h AS (
       |  SELECT doc_id AS media_id,
       |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
       |    CAST(strlen(text) AS INTEGER) AS byte_len,
       |    sha256(text) AS hx
       |  FROM documents),
       |u AS (
       |  SELECT media_id, modality, byte_len, hx,
       |    ${u16(1)} AS u16_0,
       |    ${u16(5)} AS u16_2,
       |    ${u16(9)} AS u16_4
       |  FROM h),
       |feat AS (
       |  SELECT media_id, modality, byte_len,
       |    CAST(64 + u16_0 % 1024 AS INTEGER) AS width,
       |    CAST(64 + u16_2 % 1024 AS INTEGER) AS height,
       |    CAST(CASE WHEN modality = 'video' THEN 1 + u16_4 % 300 ELSE 1 END AS INTEGER) AS frames,
       |    substr(hx, 1, 16) AS checksum
       |  FROM u)""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (seeded-hash LSH, approx sketches) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    StarQueries.oracle ++
      EventQueries.oracle ++
      LedgerQueries.oracle ++
      TextQueries.oracle ++
      SimilarityQueries.oracle ++
      PipelineQueries.oracle ++
      GraphQueries.oracle ++
      StreamingReplay.oracle ++
      Map(
        "k5_media_features" ->
          s"""$mediaCte
             |SELECT media_id, modality, byte_len, width, height, frames, checksum
             |FROM feat ORDER BY media_id""".stripMargin,

        // resize: scale = min(1, maxW/w, maxH/h); dims truncate toward zero
        // (Scala .toInt) with a floor of 1 — identical IEEE double math.
        "k5_resize" ->
          s"""$mediaCte
             |SELECT media_id, modality,
             |  CAST(GREATEST(1, TRUNC(width * LEAST(1.0, 256.0 / width, 256.0 / height))) AS INTEGER) AS width,
             |  CAST(GREATEST(1, TRUNC(height * LEAST(1.0, 256.0 / width, 256.0 / height))) AS INTEGER) AS height
             |FROM feat ORDER BY media_id""".stripMargin,

        // frame sampling: videos emit frames 0, 30, 60, …; others frame 0.
        "k5_frame_sample" ->
          s"""$mediaCte
             |SELECT media_id, CAST(f.idx AS INTEGER) AS frame_idx, checksum
             |FROM feat, UNNEST(CASE WHEN modality = 'video'
             |                       THEN range(0, frames, 30) ELSE [0] END) AS f(idx)
             |ORDER BY media_id, frame_idx""".stripMargin)
}

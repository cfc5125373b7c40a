package graft.tools

import org.apache.spark.sql.DataFrame

/** Oracle auxiliary artifacts — the mechanism that shrinks the rows-only
  * check set.
  *
  * Some declared queries start from SEEDED signatures (xxhash64 MinHash,
  * SimHash, Gaussian hyperplane buckets) that a SQL oracle cannot
  * re-derive. Leaving those queries rows-only checks NOTHING downstream of
  * the signature either — banding, bucket caps, candidate pairing,
  * verification. Instead, the query materializes its signature stage here
  * as parquet, and the oracle SQL `read_parquet`s it and independently
  * re-derives EVERYTHING downstream. The signature itself becomes the one
  * axiom; it is written by the SAME Column expression the query's plan
  * uses, so if the written artifact ever diverged from the in-plan values,
  * the derived pairs would differ and the driver's hash compare would
  * fail — the axiom is self-checking against the result, only its seeded
  * internals go unaudited.
  *
  * Fixed absolute paths, overwritten per run: the oracle SQL is a static
  * string, so the path cannot be parameterized; Verify-then-compare always
  * runs back-to-back on one sfDir, so the artifact the oracle reads is the
  * one the queries just wrote.
  */
object OracleAux {
  val Root = "/tmp/graft_oracle_aux"

  /** Plan-only dev tools (Explain, PlanAudit, QueryBench) construct the
    * declared queries without participating in a Verify→compare cycle;
    * they set this false so their construction-time writes cannot clobber
    * the artifacts a concurrent/pending oracle comparison reads (the
    * fixed paths are single-slot by design — see class doc).
    */
  @volatile var enabled: Boolean = true

  def path(name: String): String = s"$Root/$name.parquet"

  /** Write `df` as the aux artifact `name`; returns the path. One file —
    * these are signature tables of the LOCAL corpus (small); production
    * indexes are written partitioned next to the corpus instead.
    */
  def write(df: DataFrame, name: String): String = {
    val p = path(name)
    if (enabled) df.coalesce(1).write.mode("overwrite").parquet(p)
    p
  }
}

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
  * Artifacts are keyed by SCALE-FACTOR DIRECTORY (one subdir per sfDir
  * basename): a Bench run at sf0.1 between a Verify at sf0.01 and its
  * DuckDB comparison must not overwrite the artifacts that comparison
  * reads. The oracle SQL strings carry a literal `{SF}` placeholder that
  * [[graft.Verify]] substitutes with its sfDir basename when dumping
  * `oracle_sql.json` — so the dumped SQL always points at the artifacts
  * written by the same run's queries.
  */
object OracleAux {
  val Root = "/tmp/graft_oracle_aux"

  /** The placeholder Verify substitutes in dumped oracle SQL. */
  val SfToken = "{SF}"

  /** Plan-only dev tools (Explain, PlanAudit, QueryBench) construct the
    * declared queries without participating in a Verify→compare cycle;
    * they set this false so their construction-time writes cannot clobber
    * the artifacts a pending oracle comparison reads.
    */
  @volatile var enabled: Boolean = true

  def path(name: String, sfDir: String): String =
    s"$Root/${new java.io.File(sfDir).getName}/$name.parquet"

  /** Write `df` as the aux artifact `name` for the given sfDir; returns
    * the path. One file — these are signature tables of the LOCAL corpus
    * (small); production indexes are written partitioned next to the
    * corpus instead.
    */
  def write(df: DataFrame, name: String, sfDir: String): String = {
    val p = path(name, sfDir)
    if (enabled) df.coalesce(1).write.mode("overwrite").parquet(p)
    p
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: the configuration every graft deployment
  * wants, in one place —
  *
  *  - shuffle partitions sized to the executor thread count (NOT the
  *    200 default, which is wrong for local mode and must be re-derived
  *    from cluster size when deployed);
  *  - AQE on (runtime coalescing + skew-join splitting);
  *  - UTC session timezone (oracle parity + sane timestamp semantics);
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` — SESSION-WIDE POLICY:
  *    parquet TIMESTAMP(NANOS) columns (which Spark's reader otherwise
  *    rejects outright) surface as raw nanosecond longs everywhere, and the
  *    read helpers that know a column's meaning ([[graft.Tables.events]],
  *    [[graft.streaming.EventStreams.subscribe]]) convert ns→µs
  *    TimestampType. Declared here, at session construction, so it is a
  *    documented engine contract — not a conf silently flipped as a side
  *    effect of whichever read helper ran first;
  *  - [[graft.plans.GraftExtensions]] injected, so the native expressions
  *    (`dot_product`, `minhash_signature`, `simhash64`, `word_shingles`)
  *    resolve from SQL text as well as the Column API.
  */
object GraftSession {

  def builder(appName: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      // default: one shuffle partition per core (right for the shipped
      // scale factors in local mode). SPARK_GRAFT_SHUFFLE_PARTITIONS
      // overrides for bigger-than-sf1 local experiments — per-partition
      // sort sets must stay inside executor memory, which is exactly the
      // "re-derive from data scale when deployed" note above (StressSweep's
      // decade mode measured the spill cliff: k2_prefix_join at ≈sf3 with
      // 32 fixed partitions sorts 30× the rows per partition)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cores.toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)

  /** Build (or get) the session; if an existing session was returned (whose
    * construction-time extensions we cannot retrofit), register the SQL
    * functions into it directly.
    */
  def getOrCreate(appName: String, cores: Int): SparkSession = {
    val spark = builder(appName, cores).getOrCreate()
    graft.plans.GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

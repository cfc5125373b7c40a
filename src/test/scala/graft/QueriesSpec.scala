package graft

/** Contract smoke: every declared query runs on sf0.001 and returns rows;
  * every oracle key references a declared query; entry() is non-empty.
  */
class QueriesSpec extends SparkSpec {

  // Queries whose correct result CAN be empty at tiny scale factors.
  private val mayBeEmpty = Set(
    "k2_minhash_lsh", "k2_simhash", "k2_rolling_chunks",
    "g3_except", "c6_join_anti", "c6_join_semi")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracleSql key has a matching queries entry") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle without query: $unknown")
  }

  test("memoKey is sessionUUID-scoped: a fresh session never aliases a memo entry") {
    // identityHashCode keys could COLLIDE after a stopped session is
    // garbage-collected (address reuse), handing a new session another
    // session's memoized plans with dead cached blocks. sessionUUID is
    // unique per session instance for the JVM's lifetime.
    val s2 = spark.newSession()
    assert(Tables.memoKey(spark, sfDir) != Tables.memoKey(s2, sfDir),
      "distinct sessions must produce distinct memo keys")
    assert(Tables.memoKey(spark, sfDir) == Tables.memoKey(spark, sfDir),
      "the key must be stable for one session")
    assert(!Tables.memoKey(spark, sfDir).contains(
        System.identityHashCode(spark).toString + "|"),
      "keys must not be identity-hash derived")
  }

  test("every declared output schema is scalar-only (driver-comparable)") {
    // The driver's comparator sorts a pandas frame on every column; a
    // top-level ARRAY/MAP/STRUCT column crashes that sort (it took
    // k4_inverted_index down in round 6). Complex data belongs INSIDE a
    // query, serialized (array_join / to_json) at the declared boundary.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    // Per-query Try: a single query that throws during CONSTRUCTION must
    // not mask the scalar-schema invariant for every other query — report
    // construction failures as their own offender class instead.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        scala.util.Try(fn(spark, sfDir)) match {
          case scala.util.Success(df) =>
            df.schema.fields.collect {
              case f if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType] ||
                f.dataType.isInstanceOf[StructType] =>
                s"$name.${f.name}: ${f.dataType.simpleString}"
            }
          case scala.util.Failure(e) =>
            Seq(s"$name: CONSTRUCTION FAILED: ${e.getMessage.take(200)}")
        }
    }
    assert(offenders.isEmpty,
      s"non-scalar top-level columns break the driver: $offenders")
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

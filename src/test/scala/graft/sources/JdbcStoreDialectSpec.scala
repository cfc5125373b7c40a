package graft.sources

import graft.SparkSpec

/** The Postgres-dialect seam of [[JdbcStore.saveIdempotent]]: the
  * generated native statement (golden-checked against the reference's
  * `ON CONFLICT (id) DO NOTHING`, repo.rs:26,56) and the dispatch rule.
  * The Postgres leg itself cannot run in this offline sandbox (no
  * Postgres server); the Derby-backed anti-join leg is exercised
  * end-to-end in SourcesSpec/CliSpec, and this spec pins the boundary
  * between the two.
  */
class JdbcStoreDialectSpec extends SparkSpec {

  test("upsert SQL is the reference's exact statement shape") {
    assert(JdbcStore.upsertSql("transactions",
      Seq("id", "wallet_address", "amount"), "id") ===
      "INSERT INTO transactions (id, wallet_address, amount) " +
        "VALUES (?, ?, ?) ON CONFLICT (id) DO NOTHING")
    // key column must be one of the batch columns — a typo'd key must
    // fail at statement build, not as a server-side syntax error
    val e = intercept[IllegalArgumentException] {
      JdbcStore.upsertSql("t", Seq("a", "b"), "id")
    }
    assert(e.getMessage.contains("key column"))
  }

  test("dialect dispatch: postgres URLs take the native path, others the anti-join") {
    assert(JdbcStore.isPostgres("jdbc:postgresql://db:5432/graft"))
    assert(JdbcStore.isPostgres("jdbc:postgresql:graft"))
    assert(!JdbcStore.isPostgres("jdbc:derby:memory:graft;create=true"))
    assert(!JdbcStore.isPostgres("jdbc:mysql://db/graft"))
  }

  test("hasUniqueKey: PK on the key column qualifies; none or composite does not") {
    val url = s"jdbc:derby:memory:uniq${System.nanoTime()};create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE with_pk (id BIGINT PRIMARY KEY, v VARCHAR(10))")
      st.executeUpdate("CREATE TABLE no_pk (id BIGINT, v VARCHAR(10))")
      st.executeUpdate("CREATE TABLE comp_pk (a BIGINT NOT NULL, b BIGINT NOT NULL, " +
        "PRIMARY KEY (a, b))")
      st.close()
    } finally conn.close()
    // ON CONFLICT (id) is satisfiable only by a SINGLE-column unique key
    assert(JdbcStore.hasUniqueKey(url, "with_pk", "id", opts))
    assert(!JdbcStore.hasUniqueKey(url, "no_pk", "id", opts))
    assert(!JdbcStore.hasUniqueKey(url, "comp_pk", "a", opts))
    // case-insensitive on both table and key spelling
    assert(JdbcStore.hasUniqueKey(url, "WITH_PK", "ID", opts))
  }

  test("derby keeps the anti-join path: replayed batch is a no-op (dispatch regression)") {
    import spark.implicits._
    val url = s"jdbc:derby:memory:dialect${System.nanoTime()};create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val batch = Seq((1L, "w1", 5.0), (2L, "w2", 7.0))
      .toDF("id", "wallet_address", "amount")
    assert(JdbcStore.saveIdempotent(spark, batch, url, "disp_tx", "id", opts) === 2L)
    assert(JdbcStore.saveIdempotent(spark, batch, url, "disp_tx", "id", opts) === 0L)
    assert(JdbcStore.read(spark, url, "disp_tx", opts).count() === 2L)
  }
}

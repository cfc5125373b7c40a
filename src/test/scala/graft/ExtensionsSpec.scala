package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions: the native expressions are reachable from pure SQL,
  * registered into the already-running session (the extensions class
  * itself uses the same builder list at session construction).
  */
class ExtensionsSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    graft.plans.GraftExtensions.register(spark)
    spark
  }

  test("dot_product / simhash64 / word_shingles / minhash_signature work from spark.sql") {
    val row = extSpark.sql(
      """SELECT
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  simhash64(array('a', 'b')) AS sh,
        |  size(word_shingles(array('a', 'b', 'c'), 2)) AS n_shingles,
        |  size(minhash_signature(array('a b', 'b c'), 16)) AS sig_len
        |""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) != 0L)
    assert(row.getInt(2) == 2)
    assert(row.getInt(3) == 16)
  }

  test("sql functions cast inputs: dot_product works on the float-typed embeddings table") {
    Tables.embeddings(extSpark, sfDir).createOrReplaceTempView("emb_v")
    val norms = extSpark.sql(
      "SELECT vec_id, dot_product(embedding, embedding) AS sq FROM emb_v ORDER BY vec_id LIMIT 5")
      .collect()
    assert(norms.length == 5)
    assert(norms.forall(_.getDouble(1) > 0.0), "float arrays must cast, not read garbage")
  }

  test("sql results match the Column API") {
    import graft.functions.VectorExpressions.dotFast
    import org.apache.spark.sql.functions._
    val viaSql = extSpark
      .sql("SELECT dot_product(array(1.5D, -2.0D), array(0.5D, 3.0D)) AS d")
      .collect()(0).getDouble(0)
    val viaCol = extSpark.range(1)
      .select(dotFast(array(lit(1.5), lit(-2.0)), array(lit(0.5), lit(3.0))).as("d"))
      .collect()(0).getDouble(0)
    assert(viaSql == viaCol)
  }
}

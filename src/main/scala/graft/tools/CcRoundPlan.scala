package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Dump the physical plan of ONE alternating-star round (the loop body of
  * [[graft.operators.GraphOps.connectedComponents]], which materializes
  * eagerly and so never shows its per-round plan in a declared query's
  * explain) — in both the r16 shape (mid-round canon(): distinct exchanged
  * by (lo,hi), then small-star re-exchanges by u) and the r17 shape
  * (dedup exchanged by hi alone; small-star groupBy+join exchange-free).
  *
  * Usage: runMain graft.tools.CcRoundPlan [sfDir] [outDir]
  */
object CcRoundPlan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "plans/r17"
    val spark = GraftSession.getOrCreate("cc-round-plan", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def canon(df: DataFrame, a: String, b: String): DataFrame =
      df.select(least(col(a), col(b)).as("lo"),
          greatest(col(a), col(b)).as("hi"))
        .where(col("lo") =!= col("hi"))
        .distinct()
    val e = canon(Tables.orders(spark, d)
      .where(pmod(col("o_orderkey"), lit(97)) === 0)
      .select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("C"), col("o_custkey")).as("src"),
        concat(lit("S"), col("l_suppkey")).as("dst")), "src", "dst")
      .localCheckpoint(true)

    // the r16 loop body, verbatim
    def r16Round(): DataFrame = {
      val both = e.select(col("lo").as("u"), col("hi").as("v"))
        .unionAll(e.select(col("hi").as("u"), col("lo").as("v")))
      val mins = both.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = canon(
        both.join(mins, "u").where(col("v") > col("u"))
          .select(col("v"), col("m")), "v", "m")
      val sm = ls.select(col("hi").as("u"), col("lo").as("v"))
      val smins = sm.groupBy("u").agg(min(col("v")).as("m"))
      val joined = sm.join(smins, "u")
      canon(joined.select(col("v").as("a"), col("m").as("b"))
        .unionAll(joined.select(col("u").as("a"), col("m").as("b"))),
        "a", "b")
    }
    // the r17 loop body, verbatim (explode self-unions, hi-keyed dedup
    // exchange, shuffle_hash on the |V|-bounded mins sides)
    def r17Round(): DataFrame = {
      val both = e.select(explode(array(
          struct(col("lo").as("u"), col("hi").as("v")),
          struct(col("hi").as("u"), col("lo").as("v")))).as("_e"))
        .select(col("_e.u").as("u"), col("_e.v").as("v"))
      val mins = both.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
        .hint("shuffle_hash")
      val ls = both.join(mins, "u").where(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("lo"),
          greatest(col("v"), col("m")).as("hi"))
        .where(col("lo") =!= col("hi"))
        .repartition(col("hi"))
        .dropDuplicates("lo", "hi")
      val sm = ls.select(col("hi").as("u"), col("lo").as("v"))
      val smins = sm.groupBy("u").agg(min(col("v")).as("m")).hint("shuffle_hash")
      val joined = sm.join(smins, "u")
      canon(joined.select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("_e"))
        .select(col("_e.a").as("a"), col("_e.b").as("b")),
        "a", "b")
    }
    val r16Shape = r16Round()
    val r17Shape = r17Round()
    val p = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(p.resolve("cc_round_before.txt"),
      r16Shape.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    java.nio.file.Files.writeString(p.resolve("cc_round_after.txt"),
      r17Shape.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    println("[cc-round-plan] wrote cc_round_{before,after}.txt to " + outDir)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.VectorFunctions.shingles

/** Dev probe: per-stage rows + wall time of the CROSS-corpus exact prefix
  * join on a given scale dir — mirrors Dedup.prefixFilterJoinSetsAgainst
  * stage by stage (the decade sweep's superlinear-flag audit tool).
  */
object PrefixAgainstProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.6
    val spark = GraftSession.getOrCreate("graft-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "1").toInt
    (1 to runs).foreach { run =>
    println(s"[probe] ===== run $run =====")
    val docs = Tables.documents(spark, d)
    val batch = docs.filter(col("doc_id") % 50 === 0)
      .select((-(col("doc_id") + 1)).as("doc_id"),
        array_join(slice(split(col("text"), " "), lit(1),
          ceil(lit(0.8) * size(split(col("text"), " "))).cast("int")),
          " ").as("text"))
      .filter(size(split(col("text"), " ")) >= 3)
    val corpus = docs.select("doc_id", "text")
      .filter(size(split(col("text"), " ")) >= 3)

    def hashed(df0: org.apache.spark.sql.DataFrame) =
      Tables.fanOut(df0)
        .select(col("doc_id").as("_id"),
          sort_array(array_distinct(transform(
            shingles(split(col("text"), " "), 3), x => xxhash64(x))))
            .as("_toks"))
        .filter(size(col("_toks")) >= 1)
        .localCheckpoint(true)

    val lt = timed("hashedSets(batch)") { hashed(batch) }
    println(s"[probe] batchDocs=${lt.count()}")
    val rt = timed("hashedSets(corpus)") { hashed(corpus) }
    println(s"[probe] corpusDocs=${rt.count()}")

    val df = timed("unionDf+checkpoint") {
      lt.unionAll(rt).select(explode(col("_toks")).as("_tok"))
        .groupBy("_tok").agg(count(lit(1)).as("_df"))
        .localCheckpoint(true)
    }
    println(s"[probe] vocab=${df.count()}")

    def prefixes(toks: org.apache.spark.sql.DataFrame, label: String) =
      timed(s"prefixRelation($label)") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("_id").orderBy(col("_df"), col("_tok"))
        toks
          .select(col("_id"), size(col("_toks")).as("_n"),
            explode(col("_toks")).as("_tok"))
          .join(df, "_tok")
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <=
            (col("_n") - ceil(lit(threshold) * col("_n")) + 1).cast("int"))
          .select("_id", "_n", "_rn", "_tok")
          .localCheckpoint(true)
      }

    val lp = prefixes(lt, "batch")
    println(s"[probe] batchPrefixRows=${lp.count()}")
    val rp = prefixes(rt, "corpus")
    println(s"[probe] corpusPrefixRows=${rp.count()}")

    val minOv = ceil(lit(threshold / (1 + threshold)) *
      (col("_na") + col("_nb")))
    val candFilter =
      lit(threshold) * col("_na") <= col("_nb") &&
        lit(threshold) * col("_nb") <= col("_na") &&
        least(col("_na") - col("_ra"), col("_nb") - col("_rb")) + 1 >= minOv

    val la = lp.join(lt, "_id").select(col("_tok"),
      col("_id").as("id_l"), col("_n").as("_na"), col("_rn").as("_ra"),
      col("_toks").as("_ta"))
    val ra = rp.join(rt, "_id").select(col("_tok"), col("_id").as("id_r"),
      col("_n").as("_nb"), col("_rn").as("_rb"), col("_toks").as("_tb"))
    val cand = la.join(ra, Seq("_tok")).filter(candFilter)
    val nCand = timed("candidates(inline)") { cand.count() }
    println(s"[probe] candidateRows=$nCand")

    val required =
      ceil(lit(threshold / (1 + threshold)) *
        (size(col("_ta")) + size(col("_tb")))) - 1
    val out = timed("verify(inline)") {
      cand
        .withColumn("_ov", graft.functions.VectorExpressions
          .boundedSortedOverlap(col("_ta"), col("_tb"), required))
        .filter(col("_ov") >= 0)
        .withColumn("jaccard", col("_ov").cast("double") /
          (size(col("_ta")) + size(col("_tb")) - col("_ov")))
        .filter(col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard").distinct()
        .count()
    }
    println(s"[probe] truePairs=$out")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.VectorFunctions.shingles

/** Dev probe: per-stage rows + wall time of the exact prefix join on a
  * given scale dir — the audit tool for the decade sweep's superlinear
  * flag. Mirrors Dedup.prefixFilterJoinSets stage by stage.
  */
object PrefixJoinProbe {
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

    val docs = Tables.documents(spark, d)
    val planted = docs.filter(col("doc_id") % 50 === 0)
      .select((-(col("doc_id") + 1)).as("doc_id"),
        array_join(slice(split(col("text"), " "), lit(1),
          ceil(lit(0.8) * size(split(col("text"), " "))).cast("int")),
          " ").as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(planted)
      .filter(size(split(col("text"), " ")) >= 3)

    val toks = timed("hashedSets+checkpoint") {
      graft.Tables.fanOut(corpus)
        .select(col("doc_id").as("_id"),
          sort_array(array_distinct(transform(
            shingles(split(col("text"), " "), 3), x => xxhash64(x))))
            .as("_toks"))
        .filter(size(col("_toks")) >= 1)
        .localCheckpoint(true)
    }
    println(s"[probe] docs=${toks.count()}")

    val df = toks.select(explode(col("_toks")).as("_tok"))
      .groupBy("_tok").agg(count(lit(1)).as("_df"))
      .localCheckpoint(true)
    println(s"[probe] vocab=${df.count()}")
    println(s"[probe] sum_df2=${df.select(sum(col("_df") * col("_df"))).head.getLong(0)}")

    val prefixes = timed("prefixRelation") {
      toks
        .select(col("_id"), size(col("_toks")).as("_n"),
          explode(col("_toks")).as("_tok"))
        .join(df, "_tok")
        .groupBy("_id", "_n")
        .agg(sort_array(collect_list(struct(col("_df"), col("_tok"))))
          .as("_sorted"))
        .withColumn("_p",
          (col("_n") - ceil(lit(threshold) * col("_n")) + 1).cast("int"))
        .select(col("_id"), col("_n"),
          posexplode(slice(col("_sorted"), lit(1), col("_p"))))
        .select(col("_id"), col("_n"), (col("pos") + 1).as("_rn"),
          col("col._tok").as("_tok"))
        .localCheckpoint(true)
    }
    println(s"[probe] prefixRows=${prefixes.count()}")
    // prefix-token df² — the candidate join's actual output bound
    val pdf = prefixes.groupBy("_tok").agg(count(lit(1)).as("_pdf"))
    println(s"[probe] sum_pdf2=${pdf.select(sum(col("_pdf") * col("_pdf"))).head.getLong(0)}")

    val minOv = ceil(lit(threshold / (1 + threshold)) *
      (col("_na") + col("_nb")))
    val candFilter =
      lit(threshold) * col("_na") <= col("_nb") &&
        lit(threshold) * col("_nb") <= col("_na") &&
        least(col("_na") - col("_ra"), col("_nb") - col("_rb")) + 1 >= minOv
    // candidate multiplicity: rows entering the inline verify (one per
    // shared prefix token per pair, pre-distinct)
    val pa = prefixes.join(toks, "_id")
    val cands = pa.select(col("_tok"), col("_id").as("id_a"),
        col("_n").as("_na"), col("_rn").as("_ra"), col("_toks").as("_ta"))
      .join(pa.select(col("_tok"), col("_id").as("id_b"),
        col("_n").as("_nb"), col("_rn").as("_rb"), col("_toks").as("_tb")),
        Seq("_tok"))
      .filter(col("id_a") < col("id_b") && candFilter)
    val nCand = timed("candidates(inline)") { cands.count() }
    println(s"[probe] candidateRows=$nCand")

    val required =
      ceil(lit(threshold / (1 + threshold)) *
        (size(col("_ta")) + size(col("_tb")))) - 1
    val out = timed("verify(inline)") {
      cands
        .withColumn("_ov", graft.functions.VectorExpressions
          .boundedSortedOverlap(col("_ta"), col("_tb"), required))
        .filter(col("_ov") >= 0)
        .withColumn("jaccard", col("_ov").cast("double") /
          (size(col("_ta")) + size(col("_tb")) - col("_ov")))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard").distinct()
        .count()
    }
    println(s"[probe] truePairs=$out")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.VectorFunctions.shingles
import graft.operators.Dedup

/** Dev probe behind the round-12 NULL RESULT on the weighted suffix bound
  * (see `Dedup.weightedPrefix`'s scaladoc): constructs the PPJoin+-style
  * suffix-bounded variant of the all-pairs cosine candidate join — prefix
  * rows carry their element weight `_l` and exact suffix norm `_sfx`
  * (Σ l² strictly after the element in the rarest-first order); a
  * candidate matched at f prunes when `l_f² + √(sfx_a·sfx_b)` cannot
  * reach `t·√(na2·nb2)` (Cauchy–Schwarz over the suffix vectors, lossless
  * via the rarest-shared-element row) — and times it against the shipped
  * (bound-free) pipeline in matched pairs within one JVM.
  *
  * Measured: 71–73% of candidate rows pruned at sf0.1 AND at 10×, yet
  * end-to-end SLOWER both times (sf0.1: 2.1 s vs 1.4–1.6 s; 10×, 30 M
  * candidates: 7.2 s vs 5.0 s) — with inline verification, a pruned
  * candidate saves only one early-terminating merge walk, less than the
  * bound's own window/payload/filter cost. Kept for re-measurement.
  *
  * Usage: runMain graft.tools.CosineSuffixProbe [sfDir]
  */
object CosineSuffixProbe {
  def main(args: Array[String]): Unit = {
    OracleAux.enabled = false
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.8
    val spark = GraftSession.getOrCreate("cosine-suffix-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    // the k2_allpairs_cosine corpus: documents + planted 80%-truncated dups
    val docs = Tables.documents(spark, d)
    val planted = docs.filter(col("doc_id") % 50 === 0)
      .select((-(col("doc_id") + 1)).as("doc_id"),
        array_join(slice(split(col("text"), " "), lit(1),
          ceil(lit(0.8) * size(split(col("text"), " "))).cast("int")),
          " ").as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(planted)
      .filter(size(split(col("text"), " ")) >= 3)

    val toks = Dedup.hashedSets(corpus, shingles(split(col("text"), " "), 3), "doc_id")
    val per = Dedup.weightedPer(toks, Dedup.idfMicros(toks))
    val maxInv = Dedup.weightMaxInv(per)

    // the shipped prefix relation + the probe-only suffix payload: same
    // (df desc, tok desc) window as Dedup.weightedPrefix, plus `_sfx` as a
    // strictly-preceding running frame (= Σ l² after the element in the
    // rarest-first order)
    def prefixWithSuffix = {
      import org.apache.spark.sql.expressions.Window
      val ord = Window.partitionBy("_id")
        .orderBy(col("_df").desc, col("_tok").desc)
      val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val before = ord.rowsBetween(Window.unboundedPreceding, -1)
      per.select(col("_id"), col("_na2"), explode(col("_s")).as("x"))
        .select(col("_id"), col("_na2"), col("x._df").as("_df"),
          col("x._tok").as("_tok"), col("x._l").as("_l"))
        .join(maxInv, "_tok")
        .withColumn("_contrib",
          col("_l").cast("double") / sqrt(col("_na2").cast("double"))
            * (col("_l").cast("double") * col("_maxinv")))
        .withColumn("_tail", sum(col("_contrib")).over(w))
        .withColumn("_sfx",
          coalesce(sum(col("_l") * col("_l")).over(before), lit(0L)))
        .filter(col("_tail") >= threshold - 1e-9)
        .select("_id", "_tok", "_l", "_sfx")
    }

    def suffixBound = // 1e-9 slack, same convention as the shipped filters
      (col("_lf") * col("_lf")).cast("double") +
        sqrt(col("_sfa").cast("double") * col("_sfb").cast("double")) >=
        lit(threshold - 1e-9) *
          sqrt(col("_qa2").cast("double") * col("_qb2").cast("double"))

    val pa = prefixWithSuffix.join(Dedup.weightedSides(per), "_id")
    val base = pa.select(col("_tok"), col("_id").as("id_a"),
        col("_l").as("_lf"), col("_sfx").as("_sfa"), col("_na2").as("_qa2"))
      .join(pa.select(col("_tok"), col("_id").as("id_b"),
        col("_sfx").as("_sfb"), col("_na2").as("_qb2")), Seq("_tok"))
      .filter(col("id_a") < col("id_b") && Dedup.normRatioFilter(threshold))
      .localCheckpoint(true)
    val before = base.count()
    val after = base.filter(suffixBound).count()
    println(f"[probe] candidates before suffix bound: $before%d")
    println(f"[probe] candidates after  suffix bound: $after%d  " +
      f"(${100.0 * (before - after) / math.max(before, 1)}%.1f%% pruned)")

    // matched-pair timing in ONE JVM: full pipeline with vs without the
    // bound — the only sound comparison on this noisy shared host
    def fullPipeline(withSuffix: Boolean): Long = {
      val paw = prefixWithSuffix.join(Dedup.weightedSides(per), "_id")
      val cand = paw.select(col("_tok"), col("_id").as("id_a"),
          col("_l").as("_lf"), col("_sfx").as("_sfa"),
          col("_na2").as("_qa2"), col("_ks").as("_ka"), col("_vs").as("_va"))
        .join(paw.select(col("_tok"), col("_id").as("id_b"),
          col("_sfx").as("_sfb"),
          col("_na2").as("_qb2"), col("_ks").as("_kb"), col("_vs").as("_vb")),
          Seq("_tok"))
        .filter(col("id_a") < col("id_b") && Dedup.normRatioFilter(threshold) &&
          (if (withSuffix) suffixBound else lit(true)))
      cand
        .withColumn("_dot", graft.functions.VectorExpressions.sortedKeyDot(
          col("_ka"), col("_va"), col("_kb"), col("_vb")))
        .withColumn("cosine", col("_dot").cast("double") /
          sqrt(col("_qa2").cast("double") * col("_qb2").cast("double")))
        .filter(col("cosine") >= threshold)
        .select(col("id_a"), col("id_b"), col("cosine"))
        .distinct().count()
    }
    (1 to 3).foreach { i =>
      Seq(true, false).foreach { sfx =>
        val t0 = System.nanoTime()
        val n = fullPipeline(sfx)
        println(f"[probe] pipeline suffix=$sfx%-5s run $i: " +
          f"${(System.nanoTime() - t0) / 1e9}%6.2f s ($n pairs)")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.VectorFunctions.shingles
import graft.operators.Dedup

/** Dev probe for the round-12 suffix bound on the weighted all-pairs join:
  * counts candidate rows reaching the merge-walk verification WITH vs
  * WITHOUT [[Dedup.suffixBoundFilter]], on the REAL pipeline helpers (not
  * a mirror), plus wall time of the two declared cosine queries.
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
    val pa = Dedup.weightedPrefix(per, maxInv, threshold)
      .join(Dedup.weightedSides(per), "_id")
    val base = pa.select(col("_tok"), col("_id").as("id_a"),
        col("_l").as("_lf"), col("_sfx").as("_sfa"), col("_na2").as("_qa2"))
      .join(pa.select(col("_tok"), col("_id").as("id_b"),
        col("_sfx").as("_sfb"), col("_na2").as("_qb2")), Seq("_tok"))
      .filter(col("id_a") < col("id_b") && Dedup.normRatioFilter(threshold))
      .localCheckpoint(true)
    val before = base.count()
    val after = base.filter(Dedup.suffixBoundFilter(threshold)).count()
    println(f"[probe] candidates before suffix bound: $before%d")
    println(f"[probe] candidates after  suffix bound: $after%d  " +
      f"(${100.0 * (before - after) / math.max(before, 1)}%.1f%% pruned)")

    Seq("k2_allpairs_cosine", "k2_allpairs_cosine_against").foreach { q =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, d)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] $q run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

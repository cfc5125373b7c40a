package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** K3: Johnson–Lindenstrauss random projection — embedding dimensionality
  * reduction for similarity pipelines (Achlioptas 2003: a Rademacher ±1
  * matrix satisfies the JL distance-preservation lemma; no Gaussian
  * sampling needed). A 100 TB embedding corpus pays for its dimension on
  * every scan, shuffle, and index build — projecting 64 → 16 dims cuts
  * all of those 4× while keeping pairwise distances within the JL ε-band,
  * which is exactly the regime ANN pre-filters and cheap dedup passes
  * live in.
  *
  * Scale design: the projection matrix is dIn × dOut doubles derived
  * deterministically from md5 — a few KB shipped as expression literals
  * into whole-stage codegen (no join, no broadcast variable, no state);
  * projection is a per-row map. Nothing shuffles. Determinism: the signs
  * are a pure function of (tag, i, j) via md5 hex, so any engine — the
  * DuckDB gate included — re-derives the identical matrix with no aux
  * artifact, and re-running a backfill months later projects into the
  * identical space (the property that makes a projected index mergeable
  * across runs).
  */
object RandomProjection {

  /** Deterministic Rademacher sign matrix, row j = output dimension:
    * sign(i, j) = +1 iff the first hex nibble of md5("tag:i,j") < '8'
    * (an unbiased coin on a uniformly-distributed nibble).
    */
  def rademacher(dIn: Int, dOut: Int, tag: String = "rp"): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dOut) { j =>
      Array.tabulate(dIn) { i =>
        val h = md.digest(s"$tag:$i,$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.reset()
        if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
      }
    }
  }

  /** Unscaled projection of an `array<double>` column: y_j = Σ_i v_i·s_ij,
    * each output via the codegen'd [[VectorExpressions.dotFast]]
    * (left-to-right accumulation — the fold order the oracle mirrors).
    * Callers divide norms by √dOut for the unbiased JL estimate.
    */
  def project(v: Column, signs: Array[Array[Double]]): Column =
    array(signs.map(row => VectorExpressions.dotFast(v, lit(row))): _*)
}

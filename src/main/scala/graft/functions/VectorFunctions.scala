package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, built entirely from
  * codegen'd higher-order functions (`zip_with`/`aggregate`/`transform`) —
  * no UDFs in the hot path, so similarity scans stay inside whole-stage
  * codegen and vectorized parquet reads (SURVEY.md §2.K3/I2).
  */
object VectorFunctions {

  /** Cast any numeric array to array<double>. A plain array cast, not a
    * `transform` lambda: Cast is whole-stage-codegen'd while higher-order
    * transforms evaluate one interpreted lambda call per element.
    */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product; accumulates left-to-right in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Euclidean distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  /** Word n-gram shingles of a token array: `n` consecutive tokens joined by
    * a single space, distinct. Used by MinHash/Jaccard dedup. Delegates to
    * the native single-pass expression (the higher-order formulation —
    * `array_distinct(transform(sequence, i => concat_ws(slice)))` — costs
    * O(len·n) interpreted slices per row).
    */
  def shingles(tokens: Column, n: Int): Column =
    VectorExpressions.shinglesFast(tokens, n)

  /** MinHash signature: `k` independent permutations approximated by seeded
    * xxhash64; element i is min over shingles of xxhash64(i, shingle).
    */
  def minHashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleCol, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH band keys: split a k-length signature into `bands` bands of
    * k/bands rows each and hash each band. Docs sharing any band key are
    * near-dup candidates.
    */
  def lshBandKeys(signature: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    array((0 until bands).map { j =>
      struct(lit(j).as("band"), hash(lit(j), slice(signature, j * r + 1, r)).as("key"))
    }: _*)
  }

  /** Random-hyperplane LSH signature: bit i set when v·plane_i > 0.
    * Planes are seeded-deterministic; the SAME (dim, nPlanes, seed) family
    * is shared by embedding near-dup bucketing and ANN probing so their
    * buckets stay correlated.
    */
  def hyperplaneSig(v: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column = {
    // Signature bits pack into one Long; shiftleft(1L, i) is mod-64 in the
    // JVM, so i ≥ 64 would silently alias plane i with plane i−64 and
    // corrupt every LSH bucket.
    require(nPlanes >= 1 && nPlanes <= 64,
      s"nPlanes must be in [1, 64], got $nPlanes")
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.map { case (p, i) =>
      // dotFast: the codegen'd native expression — the plane is a foldable
      // literal array, so each bit costs one tight primitive-double loop.
      when(VectorExpressions.dotFast(v, array(p.map(lit): _*)) > 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}

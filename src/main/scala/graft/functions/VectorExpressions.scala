package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** I2 upgrade path (SURVEY.md §4): a native Catalyst expression with
  * `doGenCode` for the vector dot product — the one hot-loop where Spark's
  * built-ins genuinely fall short: higher-order functions
  * (`zip_with`/`aggregate`) do not participate in whole-stage codegen and
  * evaluate one boxed lambda call per element. This generates a tight
  * primitive `double` loop instead, keeping million-vector cosine scans
  * (K3 similarity search, K2 embedding near-dup) fully codegen'd.
  *
  * Semantics match [[VectorFunctions.dot]]: element-wise product summed
  * left-to-right in double; null input (either side) ⇒ null; arrays are
  * consumed up to the shorter length.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double>; the Column API below inserts the
  // cast (AbstractDataType/ImplicitCastInputTypes are private[sql]).
  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature as a native expression. The higher-order formulation
  * ([[VectorFunctions.minHashSignature]]) evaluates k interpreted
  * `xxhash64(i, shingle)` lambdas per shingle — k full string hashes with
  * per-element boxing. This computes TWO xxhash64 string hashes per shingle
  * and derives the k permutations as `h1 + i·h2` (the standard
  * double-hashing construction for MinHash families), inside one tight
  * primitive loop: ~k/2× less hashing and no boxing.
  *
  * Interpreted eval only (`CodegenFallback`) — the loop itself is the hot
  * path and is already primitive; codegen would only fuse the surrounding
  * projection.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k > 0, "signature length must be positive")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 777L) | 1L
      var i = 0
      var h = h1
      while (i < k) {
        if (h < sig(i)) sig(i) = h
        h += h2
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash-64 as a native expression: one xxhash64 per token (seed 42 —
  * bit-identical to Spark's `xxhash64(token)`), per-bit majority vote in a
  * primitive array. Replaces 64 interpreted `aggregate` lambdas per row.
  */
case class SimHash64Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) >= 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingles as a native expression: one pass over the token
  * array, joining `n` consecutive tokens per position and deduplicating via
  * a hash set of UTF8Strings (no per-position array slicing, no interpreted
  * lambdas). Degrades to the whole-doc single shingle below `n` tokens,
  * matching the higher-order formulation it replaces.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n > 0, "shingle length must be positive")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    val space = UTF8String.fromString(" ")
    val toks = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (cnt >= n) {
      i = 0
      while (i + n <= cnt) {
        out.add(UTF8String.concatWs(space, java.util.Arrays.copyOfRange(toks, i, i + n): _*))
        i += 1
      }
    } else {
      out.add(UTF8String.concatWs(space, toks: _*))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Int8 symmetric-quantization stats in ONE primitive pass:
  * `struct(scale, max_err)` where `scale = 127 / max|x|` and `max_err` is
  * the worst-case dequantization error `max|x − round(x·scale)/scale|`.
  * Replaces four interpreted higher-order passes (abs-transform, array_max,
  * dequantize-transform, zip_with+aggregate max) with a single tight
  * double loop — the K5 storage-compression hot path.
  *
  * Rounding is half-away-from-zero, matching DuckDB's ROUND on doubles and
  * — for |y| ≤ 127 at integer scale, where every shortest-decimal `k.5` is
  * also binary-exact — Spark's BigDecimal HALF_UP `round()`.
  * Zero/empty vectors yield (null, 0.0): scale is undefined, error is 0.
  */
case class QuantizeInt8StatsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("max_err", DoubleType, nullable = false)))

  override def prettyName: String = "quantize_int8_stats"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    if (maxAbs > 0) {
      val scale = 127.0 / maxAbs
      var maxErr = 0.0
      i = 0
      while (i < n) {
        val x = arr.getDouble(i)
        val y = x * scale
        val r = if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)
        val e = math.abs(x - r / scale)
        if (e > maxErr) maxErr = e
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(scale, maxErr)
    } else {
      org.apache.spark.sql.catalyst.InternalRow(null, 0.0)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Argmin-distance cell id of a vector against a fixed centroid matrix —
  * the IVF coarse-quantizer assignment ([[graft.operators.IvfAnn]]) in ONE
  * expression. The naive Column formulation — `greatest` over nLists
  * structs each containing a dot product against a 64-literal array —
  * inflates the generated code past JIT limits and falls off the compiled
  * path entirely (measured 25 s for a 20k-row assignment); here the matrix
  * lives in the expression object and assignment is a tight
  * nLists × dim primitive loop per row.
  *
  * ‖v−c‖² minimized ⟺ v·c − ‖c‖²/2 maximized (‖v‖ constant per row); ties
  * break to the LARGER cell id, matching greatest-over-structs semantics.
  * Centroids are Seq-typed so the case class keeps structural equality for
  * plan canonicalization.
  */
case class NearestCentroidExpr(child: Expression, centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.forall(_.length == centroids.head.length),
    "all centroids must share one dimension")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullable: Boolean = true

  override def prettyName: String = "nearest_centroid"

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val halfNorms: Array[Double] =
    matrix.map(c => c.map(x => x * x).sum / 2.0)

  /** A vector whose length differs from the centroid dimension yields NULL —
    * a truncated dot product would silently hand back a plausible-looking
    * cell id for garbage input (callers like IvfAnn pre-filter on
    * `size = dim`, but the public Column API carries no such guard).
    */
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != matrix(0).length) return null
    var best = 0
    var bestScore = Double.NegativeInfinity
    var i = 0
    while (i < matrix.length) {
      val c = matrix(i)
      var s = 0.0
      var j = 0
      while (j < n) { s += v.getDouble(j) * c(j); j += 1 }
      s -= halfNorms(i)
      if (s >= bestScore) { bestScore = s; best = i }
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling-hash (Karp-Rabin) content-defined chunk fingerprints of a text
  * column: a fixed-width byte window rolls over the document; positions
  * where the window hash masks to zero become chunk boundaries; the output
  * is the array of xxhash64 hashes of the chunks. Because boundaries are
  * content-defined (not offset-defined), an insertion near the start shifts
  * every byte yet leaves all downstream chunk hashes intact — the property
  * that makes this the containment/near-dup fingerprint for K4/K2 (fixed
  * blocks would lose every block after the edit).
  *
  * @param window  rolling window width in bytes
  * @param mask    boundary mask: boundary where (h & mask) == 0 — expected
  *                chunk length ≈ mask+1 bytes
  */
case class RollingChunkHashesExpr(child: Expression, window: Int, mask: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(window > 0 && mask > 0, "window and mask must be positive")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "rolling_chunk_hashes"

  private val B = 257L // odd multiplier; B^window precomputed for removal
  private val Bw: Long = {
    var p = 1L; var i = 0
    while (i < window) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = h * B + (bytes(i) & 0xffL)
      if (i >= window) h -= Bw * (bytes(i - window) & 0xffL)
      if (i >= window - 1 && (h & mask) == 0L && i + 1 - start >= window) {
        out += XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i + 1 - start, 42L)
        start = i + 1
      }
      i += 1
    }
    if (start < n || out.isEmpty) {
      out += XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, n - start, 42L)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Marker-based language argmax in ONE pass over the token array: each
  * token is looked up in a precomputed token→languages map (a marker may
  * belong to SEVERAL languages — "la" is both Spanish and French), per-
  * language hit counts accumulate, and the winner is the max count with
  * ties to the lexicographically-LAST language — for NON-NULL input,
  * bit-for-bit the semantics of `greatest()` over (score, lang) structs
  * that the interpreted formulation used (five `filter(isin…)`
  * higher-order passes per row). NULL input yields NULL (the standard
  * null-intolerant contract) where the struct formulation yielded the
  * lex-last language and the DuckDB CASE cascade yields its ELSE branch —
  * three arbitrary answers for "no text"; NULL is the only honest one.
  *
  * Markers are Seq-typed so the case class keeps structural equality for
  * plan canonicalization.
  */
case class LangArgmaxExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(markers.nonEmpty, "need at least one language")

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def prettyName: String = "lang_argmax"

  // languages in ascending order: the argmax scan below relies on it for
  // the tie-to-lexicographically-last rule
  @transient private lazy val langs: Array[UTF8String] =
    markers.map(_._1).sorted.map(UTF8String.fromString).toArray
  @transient private lazy val tokenLangs: java.util.HashMap[UTF8String, Array[Int]] = {
    val sortedLangs = markers.map(_._1).sorted
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    markers.foreach { case (lang, words) =>
      val idx = sortedLangs.indexOf(lang)
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(idx) else prev :+ idx)
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](langs.length)
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val hit = tokenLangs.get(toks.getUTF8String(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    // ascending lang order + `>=` = max count, ties to the lex-last lang
    var best = 0
    i = 1
    while (i < counts.length) {
      if (counts(i) >= counts(best)) best = i
      i += 1
    }
    langs(best)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass within-document repetition statistics over a token array:
  * struct(n_bigrams, mode_count, n_distinct) for the adjacent-bigram
  * multiset — the kernel of the Gopher-style repetition gate
  * (`TextQueries.qualitySignals`). One primitive loop with an open hash
  * map replaces a five-deep interpreted higher-order-function chain
  * (build → sort → run-length-aggregate), and because the whole
  * computation is ONE expression node, predicate pushdown can inline it
  * into a scan-side Filter without any risk of re-expanding intermediate
  * arrays per element (the projection-collapse pathology documented on
  * the previous formulation).
  *
  * Fewer than 2 tokens → NULL (no bigrams exist; matches the CASE-guarded
  * column formulation and the DuckDB oracle's `WHERE len(w) >= 2`). A NULL
  * token element also yields NULL — split() never produces one, but the
  * SQL-registered function accepts arbitrary arrays, and silently folding
  * a null into bigrams (concatWs skips nulls) would miscount.
  *
  * Bigram identity is the exact TOKEN PAIR, not a joined string: a
  * space-joined key would collide ['a b','c'] with ['a','b c'] for tokens
  * that themselves contain the separator — invisible to the declared
  * queries (their tokens come from split-on-space) but wrong for the
  * SQL-registered function over arbitrary arrays. The pair key is also
  * cheaper: no per-bigram string concatenation.
  */
case class RepetitionStatsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  // NULL for valid (<2-token / null-element) input, independent of the
  // child's nullability — same pattern as NearestCentroidExpr.
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("mode_count", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < 2) return null
    val counts = new java.util.HashMap[java.util.Map.Entry[UTF8String, UTF8String], Int](n * 2)
    var mode = 0
    var i = 0
    if (toks.isNullAt(0)) return null
    var prev = toks.getUTF8String(0)
    while (i < n - 1) {
      if (toks.isNullAt(i + 1)) return null
      val next = toks.getUTF8String(i + 1)
      val bigram = java.util.Map.entry(prev, next)
      val c = counts.merge(bigram, 1, (a, b) => a + b)
      if (c > mode) mode = c
      prev = next
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(n - 1, mode, counts.size)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bloom-filter membership probe as a native codegen'd expression: the
  * map-side prefilter for incremental dedup against a huge history
  * ([[graft.operators.Dedup.bloomDedupAgainst]]). The serialized filter
  * (built once driver-side with `df.stat.bloomFilter`, a single
  * distributed aggregate whose size is bits-bounded, never data-bounded)
  * ships with the task closure and deserializes once per executor; each
  * probe is then a handful of bit tests — no join, no shuffle, no state.
  *
  * Probes use `mightContainBinary` on the child's UTF-8 bytes, which is
  * byte-identical to the `putString` path `DataFrameStatFunctions
  * .bloomFilter` uses to build the filter over a string column, so the
  * no-false-negative guarantee holds: `false` PROVES absence from the
  * build set; `true` needs exact verification (the caller's job).
  *
  * `bits` is Seq-typed so the case class keeps structural equality for
  * Catalyst canonicalization (same reason as [[NearestCentroidExpr]]);
  * the wrapper wraps the byte array without copying.
  */
case class BloomMightContainExpr(child: Expression, bits: Seq[Byte])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bits.toArray))

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bounded merge-intersection of two SORTED long arrays — the
  * verification optimizer of the exact set-similarity join (Xiao et al.
  * WWW'08 §5: ordered-set verify with early termination). A linear merge
  * walk counts the overlap, and at every step the best still-reachable
  * overlap (`ov + min(remaining_a, remaining_b)`) is checked against the
  * `required` minimum — a pair that can no longer reach it returns −1
  * immediately instead of finishing the walk. Versus `array_intersect`
  * (hash-set build + probe per row) this is allocation-free, branch-cheap,
  * and abandons hopeless candidates at the first provable miss — the
  * verify stage's cost concentrates on TRUE near-duplicates, which is
  * exactly where the work is irreducible.
  *
  * Contract: both arrays sorted ascending, distinct elements (the
  * [[graft.operators.Dedup]] hashedSets invariant); `required` is a lower
  * bound the CALLER wants certain — the expression early-exits only when
  * the final overlap would be strictly below it, so callers keep their
  * own exact accept predicate downstream (Dedup passes α−1, one unit of
  * slack, making double-rounding in α harmless: a borderline pair is
  * verified exactly rather than pruned).
  */
case class BoundedSortedOverlapExpr(left: Expression, right: Expression,
    required: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = required

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def prettyName: String = "bounded_sorted_overlap"

  override def nullSafeEval(a: Any, b: Any, r: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val req = r.asInstanceOf[Long]
    val na = x.numElements()
    val nb = y.numElements()
    var ia = 0
    var ib = 0
    var ov = 0
    while (ia < na && ib < nb) {
      if (ov + math.min(na - ia, nb - ib) < req) return -1
      val xa = x.getLong(ia)
      val xb = y.getLong(ib)
      if (xa == xb) { ov += 1; ia += 1; ib += 1 }
      else if (xa < xb) ia += 1
      else ib += 1
    }
    if (ov >= req) ov else -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val ia = ctx.freshName("ia")
      val ib = ctx.freshName("ib")
      val ov = ctx.freshName("ov")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $ia = 0; int $ib = 0; int $ov = 0;
         |while ($ia < $na && $ib < $nb) {
         |  if ($ov + java.lang.Math.min($na - $ia, $nb - $ib) < $r) {
         |    $ov = java.lang.Integer.MIN_VALUE; break;
         |  }
         |  long $xa = $a.getLong($ia);
         |  long $xb = $b.getLong($ib);
         |  if ($xa == $xb) { $ov++; $ia++; $ib++; }
         |  else if ($xa < $xb) { $ia++; } else { $ib++; }
         |}
         |${ev.value} = ($ov >= $r) ? $ov : -1;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(left = newFirst, right = newSecond, required = newThird)
}

/** Merge-join dot product over two SPARSE VECTORS in sorted-key parallel-
  * array form — the verification kernel of the exact all-pairs cosine
  * join ([[graft.operators.Dedup.allPairsCosine]]). `(keysA, valsA)` and
  * `(keysB, valsB)` are aligned arrays (keys sorted ascending, distinct —
  * the hashedSets invariant); the walk sums `valA·valB` over matching
  * keys in one linear pass. Values are INTEGER-SCALED weights (decimal
  * micros), so the returned long dot is EXACT and merge-order-free —
  * the FP part of the cosine (one cast chain, one sqrt, one divide)
  * happens once downstream in a fixed sequence both gate engines share.
  * Allocation-free, codegen'd: the candidate-verification hot loop.
  */
case class SortedKeyDotExpr(keysA: Expression, valsA: Expression,
    keysB: Expression, valsB: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = keysA
  override def second: Expression = valsA
  override def third: Expression = keysB
  override def fourth: Expression = valsB

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "sorted_key_dot"

  override def nullSafeEval(ka: Any, va: Any, kb: Any, vb: Any): Any = {
    val xk = ka.asInstanceOf[ArrayData]
    val xv = va.asInstanceOf[ArrayData]
    val yk = kb.asInstanceOf[ArrayData]
    val yv = vb.asInstanceOf[ArrayData]
    val na = xk.numElements()
    val nb = yk.numElements()
    var ia = 0
    var ib = 0
    var dot = 0L
    while (ia < na && ib < nb) {
      val a = xk.getLong(ia)
      val b = yk.getLong(ib)
      if (a == b) { dot += xv.getLong(ia) * yv.getLong(ib); ia += 1; ib += 1 }
      else if (a < b) ia += 1
      else ib += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ka, va, kb, vb) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val ia = ctx.freshName("ia")
      val ib = ctx.freshName("ib")
      val d = ctx.freshName("dot")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      s"""
         |int $na = $ka.numElements();
         |int $nb = $kb.numElements();
         |int $ia = 0; int $ib = 0; long $d = 0L;
         |while ($ia < $na && $ib < $nb) {
         |  long $xa = $ka.getLong($ia);
         |  long $xb = $kb.getLong($ib);
         |  if ($xa == $xb) { $d += $va.getLong($ia) * $vb.getLong($ib); $ia++; $ib++; }
         |  else if ($xa < $xb) { $ia++; } else { $ib++; }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(keysA = newFirst, valsA = newSecond, keysB = newThird,
      valsB = newFourth)
}

/** Striped luma-surrogate grid for the perceptual-hash pipeline
  * ([[graft.operators.PerceptualHash]]): cell j (0..71) is the sum of the
  * Unicode code points at positions ≡ j (mod 72), mod 256 — one pass over
  * the string, O(len), instead of the 72 × O(len) passes the higher-order
  * `transform(sequence(0,71), …)` formulation would cost. Striping makes
  * the surrogate LOCALITY-PRESERVING (an edit of Δ code points perturbs
  * exactly the Δ cells its positions stripe into, so near-identical
  * payloads land at small Hamming distance) while every cell still mixes
  * ~len/72 code points, keeping non-duplicate grids uncorrelated.
  */
case class StripedGrayGridExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def prettyName: String = "striped_gray_grid"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    // accumulate in Long: an Int cell overflows (and goes NEGATIVE under
    // Scala's sign-keeping %) after ~2k astral-plane code points per
    // stripe — a ~140k-char CJK/emoji document — violating the [0,256)
    // contract and the oracle's BIGINT arithmetic; a Long needs ~10^13
    // per stripe, unreachable for any in-memory string
    val cells = new Array[Long](72)
    var i = 0
    var p = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cells(p % 72) += cp
      p += 1
      i += Character.charCount(cp)
    }
    val out = new Array[Int](72)
    var j = 0
    while (j < 72) { out(j) = (cells(j) % 256).toInt; j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API over the codegen'd expressions. */
object VectorExpressions {

  private def asDoubleArray(c: Column): Expression =
    GraftSqlBridge.expression(c.cast(ArrayType(DoubleType)))

  /** Codegen'd dot product of two numeric-array columns. */
  def dotFast(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpr(asDoubleArray(a), asDoubleArray(b)))

  /** Codegen'd cosine similarity (three dot products, one pass each). */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotFast(a, b) / (sqrt(dotFast(a, a)) * sqrt(dotFast(b, b)))
  }

  /** Native MinHash signature of a shingle-set column (array<string>). */
  def minHashFast(shingles: Column, k: Int): Column =
    GraftSqlBridge.column(MinHashSignatureExpr(GraftSqlBridge.expression(shingles), k))

  /** Native SimHash-64 of a token-set column (array<string>). */
  def simHashFast(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64Expr(GraftSqlBridge.expression(tokens)))

  /** Native word n-gram shingles of a token column (array<string>). */
  def shinglesFast(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(WordShinglesExpr(GraftSqlBridge.expression(tokens), n))

  /** Rolling-hash content-defined chunk fingerprints of a string column. */
  def rollingChunks(text: Column, window: Int = 32, mask: Long = 0x3F): Column =
    GraftSqlBridge.column(RollingChunkHashesExpr(GraftSqlBridge.expression(text), window, mask))

  /** Single-pass int8 quantization stats: struct(scale, max_err). */
  def quantizeInt8Stats(v: Column): Column =
    GraftSqlBridge.column(QuantizeInt8StatsExpr(asDoubleArray(v)))

  /** Argmin-distance centroid id for the IVF coarse quantizer. */
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    GraftSqlBridge.column(
      NearestCentroidExpr(asDoubleArray(v), centroids.map(_.toSeq).toSeq))

  /** Single-pass marker-count language argmax over a token column. */
  def langArgmax(tokens: Column, markers: Map[String, Seq[String]]): Column =
    GraftSqlBridge.column(
      LangArgmaxExpr(GraftSqlBridge.expression(tokens), markers.toSeq.sortBy(_._1)))

  /** Single-pass bigram repetition stats of a token column:
    * struct(n_bigrams, mode_count, n_distinct); NULL under 2 tokens.
    */
  def repetitionStats(tokens: Column): Column =
    GraftSqlBridge.column(RepetitionStatsExpr(GraftSqlBridge.expression(tokens)))

  /** Single-pass striped 72-cell luma-surrogate grid of a string column. */
  def stripedGrayGrid(text: Column): Column =
    GraftSqlBridge.column(StripedGrayGridExpr(GraftSqlBridge.expression(text)))

  /** Bounded merge-intersection of two sorted long-array columns: exact
    * overlap, or −1 as soon as `required` is provably unreachable.
    */
  def boundedSortedOverlap(a: Column, b: Column, required: Column): Column =
    GraftSqlBridge.column(BoundedSortedOverlapExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
      GraftSqlBridge.expression(required.cast("long"))))

  /** Merge-join dot product of two sorted-key sparse vectors in parallel-
    * array form (long keys asc + long integer-scaled values): exact long.
    */
  def sortedKeyDot(keysA: Column, valsA: Column, keysB: Column,
      valsB: Column): Column =
    GraftSqlBridge.column(SortedKeyDotExpr(
      GraftSqlBridge.expression(keysA), GraftSqlBridge.expression(valsA),
      GraftSqlBridge.expression(keysB), GraftSqlBridge.expression(valsB)))

  /** Codegen'd Bloom membership probe of a string column against a
    * serialized `org.apache.spark.util.sketch.BloomFilter`.
    */
  def bloomMightContain(key: Column, bloomBits: Array[Byte]): Column =
    GraftSqlBridge.column(BloomMightContainExpr(
      GraftSqlBridge.expression(key.cast(org.apache.spark.sql.types.StringType)),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bloomBits)))
}

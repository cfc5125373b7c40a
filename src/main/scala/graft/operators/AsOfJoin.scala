package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the reference's designed-but-unpopulated
  * `fiat_value` enrichment slot (`/root/reference/core/src/models.rs:43`,
  * `/root/reference/adapters/src/solana_parser.rs:38,78`): for each left row,
  * attach the most recent right row with `right.ts <= left.ts` per key.
  *
  * Scale design: NOT a range join (which Catalyst would plan as a
  * broadcast-nested-loop or an exploding theta join). Instead: union the two
  * sides tagged, single shuffle on the key, one ordered window pass with
  * `last(value, ignoreNulls)` carrying the latest quote forward. Cost is one
  * shuffle + one sort over |L|+|R| — the same as any keyed window — and it
  * is skew-tolerant under AQE. This is the standard "union + last-non-null"
  * formulation used at 100 TB scale for trade/quote joins.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     timeline to look up (e.g. prices); if not unique per
    *                  (key, ts), ties resolve DETERMINISTICALLY to the
    *                  greatest (valueCols) tuple — the value columns are the
    *                  window's final sort keys, so the pick cannot depend on
    *                  partitioning or scan order
    * @param keyCol    equi-key column name present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param valueCols columns of `right` to carry onto `left`
    * @param strict    if true use `right.ts < left.ts` (exclusive); default
    *                  inclusive `<=` matching DuckDB ASOF semantics
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val (l, r) = taggedSides(left, right, keyCol, leftTs, rightTs, valueCols, strict)

    // Trailing _v_* sort keys: equal-(key, ts, tag) right rows would
    // otherwise resolve "to whichever sorts last" — i.e. by partitioning
    // accident. With the value tuple as the final keys, duplicates resolve
    // to the greatest tuple on every run and every repartitioning. (Left
    // rows are unaffected: their _tag differs from every right row's.)
    val w = Window.partitionBy(keyCol)
      .orderBy((Seq(col("_ts"), col("_tag")) ++
        valueCols.map(c => col(s"_v_$c"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ONE packed struct per right row, not per-column last(): with
    // independent per-column propagation, a NULL inside a value column
    // (e.g. an SCD2 open version's valid_to) would be skipped by
    // ignoreNulls and silently backfilled from an OLDER right row —
    // producing a frankenstein row mixing versions. The struct is
    // non-null exactly for right rows (null for left rows, so ignoreNulls
    // still skips those), and all carried columns come from the SAME
    // matched row. Struct ordering is field-by-field, so the duplicate-
    // tie rule above is unchanged.
    val packed = l.unionByName(r)
      .withColumn("_v_pack",
        when(col("_tag") =!= 1, // right rows: tag 0 inclusive / 2 strict
          struct(valueCols.map(c => col(s"_v_$c").as(c)): _*)))
    val carried = packed
      .withColumn("_asof_pack", last(col("_v_pack"), ignoreNulls = true).over(w))
    carried
      .filter(col("_tag") === 1)
      .select((leftCols.map(c => col(c)) ++
        valueCols.map(c => col(s"_asof_pack").getField(c).as(c))): _*)
  }

  /** Skew-tolerant variant of [[apply]] with IDENTICAL semantics: the
    * window additionally partitions on a coarse time-range bucket
    * (`floor(ts / bucketWidth)`) within the key, so a hot key's rows split
    * across `range/bucketWidth` parallel sorts instead of one straggler
    * task sorting the whole key (ScaleCheck measures the plain form's hot
    * partition at 90% of the corpus — a single task at any cluster size).
    *
    * Correctness across bucket boundaries: each (key, bucket) window gets
    * a synthetic CARRY-IN row holding, per value column, the last non-null
    * value from all earlier buckets (the same (ts, value-tuple) total
    * order the plain window uses, so duplicate-(key, ts) ties resolve
    * identically). The carry-in sorts before every real row in its bucket
    * (tag -1 at the bucket's min ts), exactly as an older quote would.
    *
    * Cost, honestly: the right side is READ TWICE MORE (the per-bucket
    * end-state aggregate and the all-buckets union) and the left side's
    * (key, ts) pairs once more, plus a tiny per-(key, bucket) cumulative
    * window — all shuffle-keyed, none skewed. On a NON-skewed corpus this
    * makes bucketed ~2× the plain form (measured 1.06 s vs 0.47 s on the
    * sf0.1 events asof); under real key skew it wins by whatever the
    * straggler cost was (5.6× on the 90%-one-key ScaleCheck corpus at
    * 10×). Reach for it when one key dominates, not by default.
    *
    * Pick `bucketWidth` so a hot key spreads over enough buckets to fill
    * the cluster but average keys don't fragment: ~(hot-key time range) /
    * (4× cores). Degenerate widths stay correct (one bucket = plain plan).
    */
  def bucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      bucketWidth: Long,
      strict: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val leftCols = left.columns.toSeq
    val (l0, r0) = taggedSides(left, right, keyCol, leftTs, rightTs, valueCols,
      strict, bucketed = true)
    def bkt(c: Column) = floor(c.cast("double") / bucketWidth).cast("long")
    val l = l0.withColumn("_bkt", bkt(col("_ts")))
    val r = r0.withColumn("_bkt", bkt(col("_ts")))

    // Per-(key, bucket) end state: the whole value ROW at the max
    // (ts, value-tuple) among the bucket's right rows — one struct, never
    // per-column picks (per-column would backfill a NULL field from an
    // older row; see the plain form's packed-struct note). Struct max
    // reproduces the plain window's total order.
    val rBuckets = r.groupBy(col(keyCol), col("_bkt"))
      .agg(max(struct((col("_ts").as("_o_ts") +:
        valueCols.map(v => col(s"_v_$v").as(v))): _*)).as("_m"))

    // Every bucket the final window will see, with its min ts (the
    // synthetic carry row must sort before every real row of its bucket).
    val allBuckets = l.select(col(keyCol), col("_bkt"), col("_ts"))
      .unionByName(r.select(col(keyCol), col("_bkt"), col("_ts")))
      .groupBy(col(keyCol), col("_bkt")).agg(min(col("_ts")).as("_min_ts"))

    // Carry-in for bucket b = cumulative max over buckets < b. The struct
    // leads with ts and buckets are time-ordered, so max = latest quote.
    // This window partitions per KEY, but on (key, bucket) rows — the hot
    // key contributes only #buckets rows, not #quotes.
    val wCum = Window.partitionBy(keyCol).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = allBuckets
      .join(rBuckets, Seq(keyCol, "_bkt"), "left")
      .select(col(keyCol), col("_bkt"), col("_min_ts"),
        max(col("_m")).over(wCum).as("_c"))
      .filter(col("_c").isNotNull)
    val carryRows = carries.select((Seq(col(keyCol),
      col("_min_ts").as("_ts"), lit(-1).as("_tag"), col("_bkt")) ++
      leftCols.filterNot(_ == keyCol)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      valueCols.map(c => col("_c").getField(c).as(s"_v_$c"))): _*)

    val w = Window.partitionBy(col(keyCol), col("_bkt"))
      .orderBy((Seq(col("_ts"), col("_tag")) ++
        valueCols.map(c => col(s"_v_$c"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // packed-struct propagation, as in the plain form: every carried
    // column comes from the SAME right (or carry-in) row
    val packed = l.unionByName(r).unionByName(carryRows)
      .withColumn("_v_pack",
        when(col("_tag") =!= 1,
          struct(valueCols.map(c => col(s"_v_$c").as(c)): _*)))
    val carried = packed
      .withColumn("_asof_pack", last(col("_v_pack"), ignoreNulls = true).over(w))
    carried
      .filter(col("_tag") === 1)
      .select((leftCols.map(c => col(c)) ++
        valueCols.map(c => col(s"_asof_pack").getField(c).as(c))): _*)
  }

  /** Shared tagging: both sides aligned to one schema (key, _ts, _tag,
    * left payload, _v_* value slots) for the union+window formulation.
    * Tag order decides tie behavior at equal timestamps: with inclusive
    * semantics the quote at ts==left.ts must sort BEFORE the left row
    * (tag 0 < 1); strict mode sorts it after (tag 2).
    */
  private def taggedSides(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      strict: Boolean,
      bucketed: Boolean = false): (DataFrame, DataFrame) = {
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"valueCols ${valueCols.filter(leftCols.contains)} collide with left columns — " +
        "rename or drop them on one side first")
    // reserve only what the chosen variant actually uses: the bucketed-only
    // names must not narrow plain apply()'s input contract. Kept in sync
    // with the packed-struct propagation (_v_pack/_asof_pack; bucketed
    // end-state _m and carry _c) — a colliding input column would be
    // silently overwritten by withColumn, the exact corruption this
    // check exists to make loud.
    val reserved = Seq("_ts", "_tag", "_v_pack", "_asof_pack") ++
      valueCols.map(c => s"_v_$c") ++
      (if (bucketed) Seq("_bkt", "_min_ts", "_m", "_c") else Nil)
    require(!reserved.exists(leftCols.contains) && !reserved.exists(right.columns.contains),
      s"columns named ${reserved.mkString("/")} are reserved by AsOfJoin")
    val rightTag = if (strict) 2 else 0
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_tag", lit(1))
      .select((Seq(col(keyCol), col("_ts"), col("_tag")) ++
        leftCols.filterNot(_ == keyCol).map(c => col(c)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_v_$c"))): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_tag", lit(rightTag))
      .select((Seq(col(keyCol), col("_ts"), col("_tag")) ++
        leftCols.filterNot(_ == keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"_v_$c"))): _*)
    (l, r)
  }
}

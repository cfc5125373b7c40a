package graft.operators

import org.apache.spark.sql.DataFrame
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
    require(!valueCols.exists(leftCols.contains),
      s"valueCols ${valueCols.filter(leftCols.contains)} collide with left columns — " +
        "rename or drop them on one side first")
    val reserved = Seq("_ts", "_tag") ++
      valueCols.flatMap(c => Seq(s"_v_$c", s"_asof_$c"))
    require(!reserved.exists(leftCols.contains) && !reserved.exists(right.columns.contains),
      s"columns named ${reserved.mkString("/")} are reserved by AsOfJoin")
    // Tag order decides tie behavior at equal timestamps: with inclusive
    // semantics the quote at ts==left.ts must sort BEFORE the left row.
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

    // Trailing _v_* sort keys: equal-(key, ts, tag) right rows would
    // otherwise resolve "to whichever sorts last" — i.e. by partitioning
    // accident. With the value tuple as the final keys, duplicates resolve
    // to the greatest tuple on every run and every repartitioning. (Left
    // rows are unaffected: their _tag differs from every right row's.)
    val w = Window.partitionBy(keyCol)
      .orderBy((Seq(col("_ts"), col("_tag")) ++
        valueCols.map(c => col(s"_v_$c"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"_asof_$c", last(col(s"_v_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_tag") === 1)
      .select((leftCols.map(c => col(c)) ++
        valueCols.map(c => col(s"_asof_$c").as(c))): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join (point-in-time join): for each left row, the latest right
 * row with `right.ts <= left.ts` within the same key — an operator Spark
 * lacks natively (SURVEY.md §2.3 joins row). Composed from built-ins per
 * the preference order (compose > custom plan): tag and union both
 * sides, then a single `last_value(..., ignoreNulls)` window pass keyed
 * on the join key ordered by (ts, side) propagates the most recent right
 * row onto each left row.
 *
 * Scale: ONE shuffle on the join key (the window partition), then a
 * per-partition sort — the same cost shape as a sort-merge join, with no
 * range-explosion. Skewed keys behave like any window partition (AQE
 * skew handling applies to the exchange).
 *
 * Tie semantics: a right row at exactly left.ts matches (`<=`, DuckDB
 * ASOF-compatible). Right rows must be unique per (key, ts) — pre-reduce
 * the right side if not, or the picked row among ties is unspecified.
 */
object AsOfJoin {

  /**
   * @param rightCols right-side columns to carry onto left rows
   * @return left rows (all columns) + rightCols of the as-of match;
   *         rows with no match are dropped (inner as-of)
   */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    // carried right columns travel as ONE struct so a single
    // last(ignoreNulls) keeps them row-atomic — per-column fills could
    // mix values from different right rows when carried cols are NULL,
    // and a NULL in the first carried col would drop the left row
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(right.schema.fieldIndex(c))))
    val lAligned = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__r", lit(null).cast(rStructType))
    val rAligned = lCols.foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(1))
        .withColumn("__r", struct(rightCols.map(col): _*))
    )((d, c) => if (c == key) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val outCols = lCols ++ Seq("__ts", "__side", "__r")
    val unioned = lAligned.select(outCols.map(col): _*)
      .unionByName(rAligned.select(outCols.map(col): _*))
    // right rows (side=1) sort before left rows at equal ts, so `<=` holds
    val w = Window.partitionBy(col(key)).orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__f", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 0 && col("__f").isNotNull)
      .select((lCols.map(col) ++ rightCols.map(c => col(s"__f.$c").as(c))): _*)
  }
}

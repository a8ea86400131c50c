package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent right row
  * with `rightTime <= leftTime` within the same key — time-series engine
  * table stakes (SURVEY.md §2.4).
  *
  * Implementation is the union + last-observation-carried-forward window
  * trick rather than a custom SparkPlan:
  *
  *   1. tag both sides and union on (key, t, side);
  *   2. within each key, ordered by (t, side) with right rows sorting
  *      before left rows at equal t (so an exactly-simultaneous right row
  *      IS visible, matching standard ASOF `>=` semantics);
  *   3. `last(payload, ignoreNulls).over(unboundedPreceding..current)` —
  *      a running "latest right value" that left rows then read;
  *   4. keep only left rows.
  *
  * Scale analysis: ONE shuffle of (|L| + |R|) rows keyed by the join key,
  * then a per-key sort — identical shuffle shape to a sort-merge join,
  * with no row amplification (vs. a range-join which explodes). This is
  * why the union trick is preferred over `left.join(right, l.t >= r.t)`
  * + groupBy-max, which materializes every (l, r) candidate pair.
  * Catalyst cannot express it natively (no ASOF node in Spark 4.x), so the
  * preference order lands on (a) compose built-ins.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry onto matching left rows
    *                     (emitted NULL when no right row precedes).
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame =
    asof(left, right, keyCol, leftTime, rightTime, rightPayload,
      forward = false)

  /** Forward as-of: the EARLIEST right row with `rightTime >= leftTime`
    * per key (same union-window machinery run toward the future).
    */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
              leftTime: String, rightTime: String,
              rightPayload: Seq[String]): DataFrame =
    asof(left, right, keyCol, leftTime, rightTime, rightPayload,
      forward = true)

  private def asof(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTime: String, rightTime: String,
                   rightPayload: Seq[String], forward: Boolean): DataFrame = {
    // at equal timestamps the right row must be visible to the left row:
    // backward scans the past (right sorts first), forward scans the
    // future (right sorts last)
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(leftSide))
      .withColumn("_rp", lit(null).cast(
        right.select(rightPayload.map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())(
            (s, f) => s.add(f))))
    val r = right
      .withColumn("_t", col(rightTime).cast(l.schema("_t").dataType))
      .withColumn("_side", lit(rightSide))
      .withColumn("_rp", struct(rightPayload.map(col): _*))
      .select((Seq(keyCol, "_t", "_side", "_rp")).map(col): _*)
    val lSel = l.select((Seq(keyCol, "_t", "_side", "_rp") ++
      leftCols.filterNot(c => c == keyCol)).map(col): _*)
    val rAligned = lSel.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lSel.schema(c).dataType))
    }.select(lSel.columns.map(col): _*)

    val unioned = lSel.union(rAligned)
    // BOTH directions run as a running `last` over an unbounded-PRECEDING
    // frame — Spark's incremental O(rows) frame. The forward scan gets
    // there by REVERSING the per-key order (t desc, side desc): the
    // running "most recently seen" in a descending scan IS the earliest
    // right row >= t, and at equal t the right row (higher side tag)
    // still sorts before the left row that must see it. The naive
    // `first().over(current..unboundedFollowing)` frame recomputes its
    // aggregate per row — O(partition²), measured as a multi-hour stall
    // on a 200k-row key at the 10× anchor.
    val base =
      if (forward) Window.partitionBy(col(keyCol))
        .orderBy(col("_t").desc, col("_side").desc)
      else Window.partitionBy(col(keyCol))
        .orderBy(col("_t"), col("_side"))
    val carried = unioned.withColumn("_match",
      last(col("_rp"), ignoreNulls = true).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    carried.filter(col("_side") === leftSide)
      .select(leftCols.map(col) ++
        rightPayload.map(p => col("_match").getField(p).as(p)): _*)
  }
}

package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: pair each left row whose `pointCol`
  * falls inside a right row's `[startCol, endCol]` (inclusive both
  * ends, the SQL `BETWEEN` contract) — the batch "which events landed
  * in which incident/maintenance/session window" join.
  *
  * Spark 4.x has no range-join operator: `l.join(r, p >= s && p <= e)`
  * plans as BroadcastNestedLoopJoin (one side small) or a cartesian —
  * O(|L|·|R|) compares either way, the shape that dies first at scale.
  * The standard rewrite (the same one Databricks' range-join hint and
  * every streaming interval join use) turns it into an EQUI join:
  *
  *   1. quantize time into buckets of `bucketWidth`;
  *   2. each left point hashes to exactly ONE bucket;
  *   3. each right interval EXPLODES to every bucket it covers
  *      (`ceil(len/width) + 1` rows — bounded when intervals are);
  *   4. shuffle-join on bucket (plus any equi keys), then apply the
  *      exact `BETWEEN` as a residual filter.
  *
  * Because a point lives in exactly one bucket, every qualifying
  * (left, right) pair meets exactly once — no dedup pass. Cost is
  * O(|L| + |R|·spread + matches) with spread = avg buckets per
  * interval; pick `bucketWidth` near the TYPICAL interval length so
  * spread stays ~2 while buckets stay selective (width far below the
  * interval length multiplies the right side; width far above it
  * degrades the residual filter toward the cartesian it replaced).
  * The shuffle key has (time range / width) distinct values, so the
  * join parallelizes across the cluster; AQE's skew-join split covers
  * hot buckets (a flash-crowd minute).
  */
object RangeJoin {

  private val workCol = "_graft_rj_bucket"

  /** Hard bound on buckets per interval. The interval explode emits
    * `len/width + 1` rows per interval; an interval 10⁶× longer than
    * `bucketWidth` would explode to a million-element `sequence`
    * (approaching Spark's array-length ceiling and multiplying the
    * shuffle by 10⁶). A spread past ~10⁴ means `bucketWidth` is
    * mis-sized for the data — fail loud instead of building the
    * pathological plan. */
  private val maxSpread = 65536L

  /** @param left      frame holding the points
    * @param right     frame holding the intervals
    * @param pointCol  left LONG column (any linear unit: epoch-ns,
    *                  epoch-us, integer key — both sides must agree)
    * @param startCol  right interval start (inclusive), same unit
    * @param endCol    right interval end (inclusive), same unit
    * @param bucketWidth bucket size in the same unit, > 0
    * @param equiKeys  additional exact-match keys present on BOTH
    *                  sides (e.g. user_id) — folded into the shuffle
    *                  key, narrowing candidates before the residual
    * @return left columns ++ right columns of every qualifying pair
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long,
                      equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // the working column must not shadow (and then silently corrupt /
    // drop) a caller column of the same name on either input
    require(!left.columns.contains(workCol) && !right.columns.contains(workCol),
      s"input frames must not already have a `$workCol` column " +
        "(reserved as the range-join bucket key)")
    // integer `div`, never floor(a/b): the double quotient rounds above
    // 2^52 and epoch-NANOS are ~1.7e18. Truncation-toward-zero is a
    // MONOTONIC map, and any monotonic bucket function is correct here
    // (trunc(start) <= trunc(point) <= trunc(end) whenever the BETWEEN
    // holds), so negative domains stay correct too — buckets near zero
    // are merely one-wider, which only the residual filter sees.
    def bucketOf(name: String): Column = expr(s"`$name` div ${bucketWidth}L")
    val l = left.withColumn(workCol, bucketOf(pointCol))
    // spread guard runs INSIDE the plan (assert_true is codegen'd, no
    // extra pass): an interval covering more than maxSpread buckets
    // fails the job with a sizing message instead of silently building
    // a million-element sequence per row
    // NULL-bounded intervals keep their prior drop-row behavior
    // (sequence(null, ...) yields NULL → explode drops the row): the
    // guard exists to catch mis-sized bucketWidth, not dirty rows, so
    // a NULL spread coalesces to "ok" rather than failing the job
    // (assert_true raises on NULL conditions too).
    val spreadOk = assert_true(
      coalesce(bucketOf(endCol) - bucketOf(startCol) < lit(maxSpread),
        lit(true)),
      lit(s"RangeJoin: an interval spans >= $maxSpread buckets — " +
        s"bucketWidth $bucketWidth is far below the interval length; " +
        "raise bucketWidth toward the typical interval length"))
    val r = right
      .withColumn(workCol, explode(sequence(bucketOf(startCol),
        when(spreadOk.isNull, bucketOf(endCol)))))
    val joinCols = workCol +: equiKeys
    l.join(r, joinCols, "inner")
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop(workCol)
  }
}

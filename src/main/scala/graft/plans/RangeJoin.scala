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
    // integer `div`, never floor(a/b): the double quotient rounds above
    // 2^52 and epoch-NANOS are ~1.7e18. Truncation-toward-zero is a
    // MONOTONIC map, and any monotonic bucket function is correct here
    // (trunc(start) <= trunc(point) <= trunc(end) whenever the BETWEEN
    // holds), so negative domains stay correct too — buckets near zero
    // are merely one-wider, which only the residual filter sees.
    def bucketOf(name: String): Column = expr(s"`$name` div ${bucketWidth}L")
    val l = left.withColumn("_rj_b", bucketOf(pointCol))
    val r = right.withColumn("_rj_b",
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    val joinCols = "_rj_b" +: equiKeys
    l.join(r, joinCols,  "inner")
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop("_rj_b")
  }
}

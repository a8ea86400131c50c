package graft.lagops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucket downsampling (resample): collapse each series to one row
  * per fixed time bucket carrying open/high/low/close/count — the
  * classic OHLC reduction, and the inverse-direction twin of the
  * reference's lag expansion (lag widens a series into a matrix;
  * resample narrows it into buckets).
  *
  * Implemented as ONE combinable hash aggregate: `min_by`/`max_by` with
  * a (time, tiebreak) struct ordering key give open/close without any
  * window pass, so partial aggregation happens map-side and the only
  * exchange is bucket-keyed and pre-combined — at 100 TB the shuffle
  * carries one row per (series, bucket) per map partition, not per
  * event. (The window formulation — first_value/last_value over a
  * (series, bucket) partition — shuffles every event row; the DuckDB
  * oracle uses that form precisely because it is a different plan for
  * the same semantics.)
  *
  * @param bucket   a DATE_TRUNC-style unit accepted by
  *                 [[org.apache.spark.sql.functions.date_trunc]]
  *                 (e.g. "hour", "day")
  * @param orderCols total-order tiebreak within a series (include a
  *                  unique key, same contract as [[LagSpec.orderCols]])
  */
object Resample {
  def ohlc(df: DataFrame, valueCol: String, timeCol: String,
           seriesCols: Seq[String], orderCols: Seq[String],
           bucket: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must provide a total order")
    val ord = struct(orderCols.map(col): _*)
    val v = col(valueCol)
    val keys: Seq[Column] =
      seriesCols.map(col) :+ date_trunc(bucket, col(timeCol)).as("bucket")
    df.groupBy(keys: _*)
      .agg(
        min_by(v, ord).as(s"${valueCol}_open"),
        max(v).as(s"${valueCol}_high"),
        min(v).as(s"${valueCol}_low"),
        max_by(v, ord).as(s"${valueCol}_close"),
        // count(lit(1)), not count(v): the DuckDB oracle counts rows
        // (count(*)); count(v) would silently skip null values and
        // diverge the moment the value column is nullable
        count(lit(1)).as("n"))
  }
}

package graft.lagops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical diagnostics over the lag machinery's output — the
  * questions a modeler asks of a lag matrix once it exists: how
  * self-correlated is each series (ACF), how do two series co-move at
  * an offset (cross-correlation), what part of a series is trend vs
  * residual (decomposition), and which points sit far outside their
  * own recent history (rolling-z anomalies). The reference crate
  * (`src/lib.rs:3-4`) builds lag matrices precisely to feed this kind
  * of analysis; these operators close the loop inside the engine.
  *
  * Scale shape shared by all four: event rows cross the wire at most
  * ONCE — either through the series-keyed window exchange the lag
  * family already pays, or through a combinable time-bucket aggregate
  * — and every output is series-, lag-, or bucket-sized.
  */
object SeriesStats {

  /** Per-series autocorrelation function for lags `1..maxLag`:
    * `acf(s, k) = corr(value_t, value_{t-k})` over the rows of series
    * `s` where both sides exist (head rows, where the lag is null, drop
    * out of the pair set — the same truncating-shift semantics as the
    * reference's lag matrix, `src/lib.rs:262-264`).
    *
    * Plan: ONE series-keyed window pass computes all `maxLag` lag
    * columns (Catalyst's `CollapseWindow` stacks them over a single
    * Exchange + Sort), then ONE hash aggregate per series computes all
    * `maxLag` Pearson correlations as combinable `corr` partials —
    * the grouping key equals the window partitioning, so the aggregate
    * adds no second exchange. Output is series × maxLag rows.
    *
    * Spark's `corr` yields NaN on a zero-variance frame where SQL
    * engines yield NULL; the NaN is normalized to NULL so undefined is
    * spelled one way.
    *
    * Output: (seriesCols..., lag, n_pairs, acf) with `acf` rounded to
    * 6dp (ratio-of-sums parity convention).
    */
  def acf(df: DataFrame, valueCol: String, spec: LagSpec,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    require(spec.seriesCols.nonEmpty,
      "acf requires at least one series column (per-series correlation)")
    val lags = 1 to maxLag
    // lag 0 keeps the unshifted value column in the wide projection
    val wide = LagMatrix.wide(df, valueCol,
      spec.copy(lags = 0 +: lags, fill = None))
    val aggs = lags.flatMap { k =>
      val lagged = col(s"${valueCol}_lag_$k")
      Seq(
        count(when(lagged.isNotNull && col(valueCol).isNotNull, 1))
          .as(s"_n$k"),
        corr(col(valueCol), lagged).as(s"_c$k"))
    }
    val perSeries = wide.groupBy(spec.seriesCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val rows = lags.map { k =>
      val c = col(s"_c$k")
      struct(lit(k).as("lag"), col(s"_n$k").as("n_pairs"),
        round(when(isnan(c), lit(null)).otherwise(c), 6).as("acf"))
    }
    perSeries
      .select(spec.seriesCols.map(col) :+
        explode(array(rows: _*)).as("_r"): _*)
      .select(spec.seriesCols.map(col) :+ col("_r.lag") :+
        col("_r.n_pairs") :+ col("_r.acf"): _*)
  }

  /** Cross-correlation between two event streams at bucketed time
    * offsets: resample each stream to `bucketSeconds` means, then for
    * every shift `k ∈ [-maxShift, maxShift]` correlate stream A at
    * bucket `t` with stream B at bucket `t + k` (positive `k`: B lags
    * A — A leads). The lead/lag structure between streams is what the
    * reference's 2-D lag matrix exists to expose; this computes the
    * summary statistic directly.
    *
    * Plan: event rows feed ONE combinable conditional-average
    * aggregate (bucket-sized output — at 100 TB a year of hourly
    * buckets is ~10k rows, so everything after the first aggregate is
    * index-sized); shifts come from a broadcast self-join of the
    * bucket frame against itself on `bucket + k·step` (no
    * single-partition global-order window anywhere), and each shift's
    * correlation is a combinable `corr` over bucket rows. Output is
    * `2·maxShift + 1` rows.
    *
    * Output: (shift, n_pairs, xcorr) — `xcorr` 6dp-rounded, NULL when
    * undefined (< 2 pairs or zero variance).
    */
  def crossCorr(df: DataFrame, typeCol: String, tsCol: String,
                valueCol: String, typeA: String, typeB: String,
                bucketSeconds: Long, maxShift: Int): DataFrame = {
    require(maxShift >= 0, s"maxShift must be >= 0, got $maxShift")
    require(bucketSeconds > 0, s"bucketSeconds must be > 0, got $bucketSeconds")
    val b = df
      .filter(col(typeCol).isin(typeA, typeB))
      .groupBy((floor(unix_timestamp(col(tsCol)) / bucketSeconds)
        * bucketSeconds).as("_bucket"))
      .agg(
        avg(when(col(typeCol) === typeA, col(valueCol))).as("_va"),
        avg(when(col(typeCol) === typeB, col(valueCol))).as("_vb"))
    val shifts = (-maxShift to maxShift).map(k => lit(k))
    val left = b.select(col("_bucket"), col("_va"))
      .where(col("_va").isNotNull)
      .select(col("_bucket"), col("_va"),
        explode(array(shifts: _*)).as("shift"))
    val right = b.select(col("_bucket").as("_bucket_b"), col("_vb"))
      .where(col("_vb").isNotNull)
    val c = corr(col("_va"), col("_vb"))
    left
      .join(broadcast(right),
        left("_bucket") + col("shift") * bucketSeconds === col("_bucket_b"))
      .groupBy(col("shift"))
      .agg(count(lit(1)).as("n_pairs"),
        round(when(isnan(c), lit(null)).otherwise(c), 6).as("xcorr"))
  }

  /** Additive trend decomposition by centered moving average:
    * `trend_t = mean(value_{t-w} .. value_{t+w})` per series (partial
    * head/tail windows use the rows that exist, the standard
    * edge-shrinking convention), `resid_t = value_t − trend_t`.
    *
    * Plan: one series-keyed window exchange, one incremental
    * `rowsBetween(-w, w)` frame — never an unbounded-following frame
    * (the quadratic-frame fence applies; a symmetric bounded frame is
    * incremental in Spark's WindowExec).
    *
    * Output: input key cols + (value, trend, resid), 6dp.
    */
  def decompose(df: DataFrame, valueCol: String, spec: LagSpec,
                halfWidth: Int): DataFrame = {
    require(halfWidth >= 1, s"halfWidth must be >= 1, got $halfWidth")
    val w = Window
      .partitionBy(spec.seriesCols.map(col): _*)
      .orderBy(spec.orderCols.map(col): _*)
      .rowsBetween(-halfWidth, halfWidth)
    df.withColumn("_trend", avg(col(valueCol)).over(w))
      .withColumn("trend", round(col("_trend"), 6))
      .withColumn("resid", round(col(valueCol) - col("_trend"), 6))
      .drop("_trend")
  }

  /** Rolling-z anomaly score: each point against the mean/stddev of its
    * own previous `window` observations in the series (the baseline
    * frame ends at the PREVIOUS row, so a spike never suppresses its
    * own detection). `z` is NULL (sentinel left to the caller) when the
    * baseline has < 2 points or zero spread — the same undefined-is-
    * NULL convention as [[acf]].
    *
    * Plan: one series-keyed window exchange; mean, stddev and count
    * share one bounded trailing frame (incremental, never quadratic).
    *
    * Output: input cols + (base_n, z, is_anomaly).
    */
  def anomalies(df: DataFrame, valueCol: String, spec: LagSpec,
                window: Int, threshold: Double): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val w = Window
      .partitionBy(spec.seriesCols.map(col): _*)
      .orderBy(spec.orderCols.map(col): _*)
      .rowsBetween(-window, -1)
    val n = count(col(valueCol)).over(w)
    val mu = avg(col(valueCol)).over(w)
    val sd = stddev_samp(col(valueCol)).over(w)
    val zRaw = (col(valueCol) - mu) / sd
    val z = when(col("base_n") >= 2 && col("_sd").isNotNull &&
        !isnan(col("_sd")) && col("_sd") > 0, col("_z"))
    df.withColumn("base_n", n)
      .withColumn("_sd", sd)
      .withColumn("_z", zRaw)
      .withColumn("z", round(z, 6))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > threshold,
        lit(false)))
      .drop("_sd", "_z")
  }
}

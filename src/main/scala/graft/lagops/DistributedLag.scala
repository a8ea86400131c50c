package graft.lagops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global-order lag (SURVEY.md §7.3 "hard parts").
  *
  * `Window.orderBy` with no partition key collapses to ONE partition — fine
  * at test scale, fatal at 100 TB. This operator computes the identical
  * result with bounded parallelism:
  *
  *   1. bucket on the order key via driver-pinned literal cut points
  *      ([[graft.util.RangeBuckets]]): bucket i holds a contiguous key
  *      range, all buckets sortable independently — and because the
  *      bucket id is a deterministic projection (not
  *      `spark_partition_id()` over a re-sampled range exchange), the
  *      forked subplans below (base rows / tails / pads) always agree
  *      on the boundaries;
  *   2. each bucket's first `max(lags)` rows are missing their history —
  *      so every bucket RECEIVES a copy of the last `max(lags)`
  *      preceding rows as pads, drawn from earlier buckets' tails (they
  *      sort first naturally, their keys being smaller);
  *   3. one partitioned window pass computes all lags; pad rows are
  *      dropped after supplying history.
  *
  * Data moved for the fix-up: `numBuckets × max(lags)` rows — constant per
  * bucket, independent of data size. This is the distributed analogue of
  * the reference's overlapping `copy_from_slice` windows
  * (`src/lib.rs:518-524`). Pads cascade across empty or undersized
  * buckets (see inline note), so no minimum bucket size is assumed.
  */
object DistributedLag {

  def wide(df: DataFrame, valueCol: String, spec: LagSpec,
           numBuckets: Int = 32): DataFrame = {
    require(spec.seriesCols.isEmpty,
      "partitioned (2-D) lag parallelizes naturally; use LagMatrix.wide")
    LagMatrix.validate(df, valueCol, spec)
    val ordCols = spec.orderCols.map(col)
    val maxLag = spec.lags.max

    // cut points on the PRIMARY order column only: rows tied on it land
    // in one bucket (a function of the key can't split ties), and the
    // bucket id stays monotone in the full order — contiguity holds
    val bounds = graft.util.RangeBuckets.boundaries(
      df, spec.orderCols.head, numBuckets)
    val bucketed = df.withColumn("_bucket",
      graft.util.RangeBuckets.bucketCol(col(spec.orderCols.head), bounds))

    // Each bucket head is missing the last `maxLag` rows (in global
    // order) that precede the bucket. Those rows always lie within the
    // TAILS (last maxLag rows) of earlier buckets: a global suffix of a
    // union of contiguous ranges is a union of per-range suffixes. So
    // pads are drawn from the tail set and ranked per TARGET bucket,
    // which cascades correctly across undersized or empty buckets that
    // approximate-quantile cut points can produce (a naive "previous
    // bucket only" rule silently fills such heads with NULLs). The tail
    // set is
    // ≤ numBuckets × maxLag rows, so the non-equi pairing below touches
    // ≤ numBuckets² × maxLag narrow rows — a fixed-size fix-up stage,
    // independent of data volume.
    val wDesc = Window.partitionBy(col("_bucket"))
      .orderBy(ordCols.map(_.desc): _*)
    val tails = bucketed
      .withColumn("_rn_end", row_number().over(wDesc))
      .filter(col("_rn_end") <= maxLag)
      .drop("_rn_end")
    val targets = tails.select(col("_bucket").as("_tgt")).distinct()
    val pads = tails.join(broadcast(targets), col("_bucket") < col("_tgt"))
      .withColumn("_rk", row_number().over(Window.partitionBy(col("_tgt"))
        .orderBy(ordCols.map(_.desc): _*)))
      .filter(col("_rk") <= maxLag)
      .drop("_bucket", "_rk")
      .withColumnRenamed("_tgt", "_bucket")
      .withColumn("_pad", lit(true))

    val unioned = bucketed.withColumn("_pad", lit(false))
      .unionByName(pads)

    val w = Window.partitionBy(col("_bucket")).orderBy(ordCols: _*)
    val lagCols = spec.lags.distinct.map { k =>
      val c =
        if (k == 0) col(valueCol)
        else spec.fill match {
          case Some(f) => lag(col(valueCol), k, f).over(w)
          case None    => lag(col(valueCol), k).over(w)
        }
      c.as(LagMatrix.lagName(valueCol, k))
    }
    val keep = (spec.seriesCols ++ spec.orderCols).distinct.map(col)
    val out = unioned
      .select(keep ++ Seq(col("_pad"), col("_bucket")) ++ lagCols: _*)
      .filter(!col("_pad"))
      .drop("_pad", "_bucket")

    // bucket 0 has no predecessor: its head fill semantics are already
    // correct (true start of the series). Buckets > 0 heads got real
    // history from pads. Fill-value heads only appear at the true start.
    out
  }
}

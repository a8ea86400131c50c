package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic range bucketing for operators that FORK a plan over a
  * bucketed frame (distributed prefix sums, global-lag boundary pads).
  *
  * `repartitionByRange` + `spark_partition_id()` is NOT safe under a
  * plan fork: RangePartitioner re-SAMPLES its boundaries per exchange
  * instance (the sample seed derives from the RDD id), so two subplans
  * that each re-evaluate the shuffle can disagree on bucket boundaries
  * and silently break any cross-branch invariant. Correctness would
  * rest on Spark's ReuseExchange rule happening to dedup the two
  * instances — one optimizer change away from wrong answers.
  *
  * Instead: sample the key's quantiles ONCE driver-side and pin the cut
  * points as literals; the bucket id becomes a pure deterministic
  * projection every subplan computes identically (the same pattern that
  * pins IVF centroids as literals, [[graft.simops.Ivf]]). A downstream
  * `Window.partitionBy(bucket)` provides the physical clustering — the
  * explicit range exchange (which that window would have re-shuffled
  * anyway, hash-on-bucket) disappears entirely.
  *
  * Any boundary placement yields correct results for these operators
  * (prefix sums telescope across arbitrary splits; lag pads cascade
  * across undersized buckets) — boundaries only steer BALANCE, so the
  * driver-side pass can be a cheap approximate quantile over the key
  * column alone (scan pruned to one column; at 100 TB, set numBuckets a
  * few × the shuffle partition count to smooth hash-placement skew).
  */
object RangeBuckets {

  /** Up to `numBuckets - 1` ascending cut points for `keyCol`, computed
    * once on the driver. Empty input (or a constant key) degenerates to
    * fewer — possibly zero — cut points, which downstream operators must
    * already tolerate (range sampling could always produce empty
    * buckets).
    *
    * The key must be NUMERIC, DATE, or TIMESTAMP typed (anything with a
    * meaningful cast to double): a string key would cast to all-NULL,
    * every row would land in bucket 0, and the operator built on top
    * would silently degenerate into the single-partition plan this
    * bucketing exists to avoid — so that is rejected loudly here.
    * [[graft.lagops.DistributedLag]] and
    * [[graft.pipeline.Pipeline.seqPack]] inherit this contract for
    * their order keys.
    */
  def boundaries(df: DataFrame, keyCol: String,
                 numBuckets: Int): Array[Double] = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    import org.apache.spark.sql.types._
    val dt = df.schema(keyCol).dataType
    val ok = dt.isInstanceOf[NumericType] || dt.isInstanceOf[DateType] ||
      dt.isInstanceOf[TimestampType] || dt.isInstanceOf[TimestampNTZType]
    require(ok, s"RangeBuckets: order key '$keyCol' must be numeric, " +
      s"date, or timestamp typed for quantile bucketing; got $dt " +
      "(a non-castable key would silently collapse to one bucket)")
    if (numBuckets == 1) Array.empty
    else {
      val probs = (1 until numBuckets).map(_.toDouble / numBuckets).toArray
      df.select(col(keyCol).cast("double").as("_k"))
        .stat.approxQuantile("_k", probs, 0.001)
        .distinct.sorted
    }
  }

  /** Bucket id = number of cut points ≤ key: a flat codegen'd sum of
    * comparisons against literals, monotone in the key (so buckets are
    * contiguous key ranges) and identical wherever it is re-evaluated.
    */
  def bucketCol(key: Column, bounds: Array[Double]): Column =
    if (bounds.isEmpty) lit(0)
    else bounds.map(b => when(key.cast("double") >= lit(b), 1).otherwise(0))
      .reduce(_ + _)
}

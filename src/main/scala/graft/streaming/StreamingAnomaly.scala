package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class AnomalyEvent(event_id: Long, ts: java.sql.Timestamp,
                              user_id: Long, value: Double,
                              base_n: Long, z: Option[Double],
                              is_anomaly: Boolean)

/** Rolling-z anomaly detection AT the ingest point — the streaming
  * twin of [[graft.lagops.SeriesStats.anomalies]]: each event scored
  * against the mean/stddev of its key's previous `window` observations,
  * so an alert fires while the event is in flight instead of in the
  * nightly batch.
  *
  * State is the [[StreamingLag]] ring: O(window) doubles per key,
  * constant per entity — the shape a 1000-node cluster's state store
  * holds for any key cardinality. Dead keys evict via
  * `ProcessingTimeTimeout` (no output owed — the ring is derived data).
  *
  * Parity with the batch operator is exact: the baseline mean is the
  * plain sum/n of Spark's `Average` and the stddev the Welford
  * recurrence of `stddev_samp` (two separate aggregates in the batch
  * plan — their means differ by ulps, so both arithmetics are
  * mirrored), over the ring in the batch engine's (ts, event_id) frame
  * order, and z is rounded with the same BigDecimal HALF_UP rule as
  * Spark's `round` — pinned in StreamingSpec. The same ordering
  * contract as [[StreamingLag.lagged]] applies across micro-batches.
  */
object StreamingAnomaly {

  /** Spark's `round(x, 6)`: shortest-repr BigDecimal, HALF_UP. */
  private def round6(x: Double): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Baseline moments over the values in frame order (oldest → newest —
    * the order the batch window aggregate consumes its frame),
    * returning (n, mean, sampleStddev). The mean for the z NUMERATOR is
    * the plain left-to-right sum / n — Spark's `Average` — while the
    * stddev keeps the Welford recurrence `stddev_samp` uses: the batch
    * operator computes them as two SEPARATE aggregates whose means
    * differ by ulps, and matching each aggregate's own arithmetic is
    * what makes the 6dp-rounded z bit-identical. */
  private def moments(oldestFirst: Seq[Double]): (Long, Double, Double) = {
    var n = 0L; var sum = 0.0; var mean = 0.0; var m2 = 0.0
    oldestFirst.foreach { x =>
      n += 1
      sum += x
      val delta = x - mean
      mean += delta / n
      m2 += delta * (x - mean)
    }
    (n, if (n > 0) sum / n else 0.0,
      if (n >= 2) math.sqrt(m2 / (n - 1)) else 0.0)
  }

  def anomalies(events: Dataset[EventRow], window: Int, threshold: Double,
                idleTimeout: String = "1 hour"): Dataset[AnomalyEvent] = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Double], AnomalyEvent](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow],
         state: GroupState[List[Double]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // ring: most-recent-first, capped at `window`
            var hist = state.getOption.getOrElse(Nil)
            val out = rows.toSeq
              .sortBy(e => (StreamingLag.tsNanos(e.ts), e.event_id))
              .map { e =>
                val (n, mu, sd) = moments(hist.reverse)
                val z = if (n >= 2 && sd > 0)
                  Some(round6((e.value - mu) / sd)) else None
                hist = (e.value :: hist).take(window)
                AnomalyEvent(e.event_id, e.ts, userId, e.value, n, z,
                  z.exists(v => math.abs(v) > threshold))
              }
            state.update(hist)
            state.setTimeoutDuration(idleTimeout)
            out.iterator
          }
      }
  }
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class LaggedEvent(event_id: Long, ts: java.sql.Timestamp,
                             user_id: Long, value: Double,
                             lags: Array[Option[Double]])

/** Lag features over a STREAM: the reference's lag matrix
  * (`src/lib.rs:487-538`) computed incrementally with bounded state.
  *
  * Batch lagging sorts each series; a stream can't. Instead each key
  * holds a ring of its last `maxLag` values — exactly the sliding window
  * the reference's copy loop reads — and every arriving event emits its
  * lag vector then pushes itself into the ring. State is
  * O(keys × maxLag): constant per entity, the shape that scales to a
  * 1000-node cluster's state store.
  *
  * Within a micro-batch, rows are sorted by (ts, event_id) before state
  * is applied so replays are deterministic; ACROSS micro-batches events
  * must arrive in order per key (the usual kafka-partition-per-key
  * contract) — an out-of-order straggler would see the newer history.
  */
object StreamingLag {

  /** Full-nanosecond epoch of a Timestamp (getTime alone is ms-truncated,
    * which would order same-millisecond events differently than the
    * batch engine's ns order key).
    */
  def tsNanos(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos

  /** Per-key state is O(maxLag) by construction, but a high-cardinality
    * dead-key population (users that never return) would park those
    * rings in the state store forever. `ProcessingTimeTimeout` evicts a
    * key after `idleTimeout` of no input — a returning user simply
    * starts with an empty history, exactly what the batch engine
    * computes for a series' first rows. In batch execution timeouts
    * never fire, so batch≡stream parity is unchanged.
    */
  def lagged(events: Dataset[EventRow], lags: Seq[Int],
             idleTimeout: String = "1 hour"): Dataset[LaggedEvent] = {
    require(lags.nonEmpty && lags.forall(_ > 0), s"positive lags, got $lags")
    import events.sparkSession.implicits._
    val maxLag = lags.max
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Double], LaggedEvent](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[List[Double]]) =>
          if (state.hasTimedOut) {
            // dead key: the lag ring is derived data (unlike an open
            // session it owes no output) — just drop it
            state.remove()
            Iterator.empty
          } else {
            // history head = most recent prior value
            var hist = state.getOption.getOrElse(Nil)
            val out = rows.toSeq.sortBy(e => (tsNanos(e.ts), e.event_id)).map { e =>
              val lagVec = lags.map { k =>
                if (hist.length >= k) Some(hist(k - 1)) else None
              }.toArray
              hist = (e.value :: hist).take(maxLag)
              LaggedEvent(e.event_id, e.ts, userId, e.value, lagVec)
            }
            state.update(hist)
            state.setTimeoutDuration(idleTimeout)
            out.iterator
          }
      }
  }
}

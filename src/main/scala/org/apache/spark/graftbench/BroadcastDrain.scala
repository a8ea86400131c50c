package org.apache.spark.graftbench

import org.apache.spark.SparkContext
import org.apache.spark.storage.BroadcastBlockId

/** Bench-harness utility (NOT part of the graft operator surface):
  * synchronously removes every broadcast block from the local
  * BlockManager between timed queries.
  *
  * Why it exists: `Bench`/`ScaleBench` time ~170 queries inside ONE
  * JVM. RDD/localCheckpoint blocks are already drained per query
  * (`getPersistentRDDs` + unpersist), but broadcast blocks are not
  * RDDs — each broadcast-hash-join and literal-heavy plan pins
  * `broadcast_N` blocks in the MemoryStore, and their cleanup rides
  * the ContextCleaner's weak-reference queue, which is ASYNC and
  * GC-paced: after ~160 queries the accumulated blocks put the store
  * under eviction pressure and the heavy dedup rows read 1.4–4×
  * their isolated cost (rounds 9–11 each spent adjudication effort on
  * exactly this). Removing the blocks synchronously makes in-suite
  * seconds match isolated seconds, so the anchor table needs no
  * footnotes.
  *
  * Lives under `org.apache.spark` because the BlockManagerMaster
  * removal API is `private[spark]` — the public alternative
  * (waiting on the ContextCleaner) is what's being replaced. Safe in
  * the harness context: it runs BETWEEN queries, when no live plan
  * holds a broadcast; a Broadcast object whose blocks are removed
  * would only fail if re-read afterwards, and each query builds its
  * broadcasts afresh.
  */
object BroadcastDrain {
  /** Remove all broadcast blocks (driver + executor stores); returns
    * how many distinct broadcast ids were dropped.
    */
  def drain(sc: SparkContext): Int = {
    val master = sc.env.blockManager.master
    val ids = master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId],
        askStorageEndpoints = true)
      .collect { case BroadcastBlockId(bid, _) => bid }
      .toSet
    ids.foreach(bid =>
      master.removeBroadcast(bid, removeFromMaster = true, blocking = true))
    ids.size
  }
}

/** Dev-probe utility: block until the listener bus has delivered all
  * queued events (the API is `private[spark]`), so per-query
  * stage/task metric counters read complete totals.
  */
object ListenerSync {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

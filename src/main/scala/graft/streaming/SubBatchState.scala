package graft.streaming

import scala.jdk.CollectionConverters._

/** Thread-safe, replay-idempotent per-sub-batch state for the
  * foreachBatch maintenance/serve loops (§2h): writes happen on the
  * stream-execution thread, the final read on the caller thread after
  * `awaitTermination()`. A plain ListBuffer there has two defects —
  * no happens-before edge between the two threads (visibility relied
  * on incidental synchronization inside StreamingQuery), and a
  * redelivered micro-batch would APPEND duplicate rows to the
  * returned union even though the index state itself (segment files
  * named by sub-batch, txn-versioned commits) is replay-idempotent.
  *
  * This store keys every value by its sub-batch id and REPLACES on
  * replay, so the caller-side union is exactly one entry per
  * sub-batch however many times the engine delivers it, and
  * `ConcurrentHashMap` supplies the cross-thread visibility edge.
  */
final class SubBatchState[V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[Int, V]()

  /** Insert-or-replace the value for sub-batch `k` (replace = replay). */
  def put(k: Int, v: V): Unit = m.put(k, v)

  def isEmpty: Boolean = m.isEmpty
  def nonEmpty: Boolean = !m.isEmpty

  /** All values in ascending sub-batch order. */
  def values: Seq[V] = m.asScala.toSeq.sortBy(_._1).map(_._2)

  /** All (sub-batch id, value) pairs in ascending id order — the fold
    * path's shape, where each landed segment carries the id the
    * replay-guard markers are keyed by (r15 VERDICT item 5). */
  def entries: Seq[(Int, V)] = m.asScala.toSeq.sortBy(_._1)

  /** Values of STRICTLY earlier sub-batches — the state a replayed
    * sub-batch `k` must see: exactly what it saw the first time. */
  def earlier(k: Int): Seq[V] =
    m.asScala.toSeq.filter(_._1 < k).sortBy(_._1).map(_._2)

  /** Drop all entries — called when a policy-triggered fold lands the
    * tracked segments in the bucketed base, so the store only ever
    * holds UNFOLDED segments (r15: FoldPolicy wiring). */
  def clear(): Unit = m.clear()
}

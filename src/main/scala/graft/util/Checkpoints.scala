package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Storage discipline for iterative operators (kCore peel, label
 * propagation, star contraction): each round re-materializes its
 * frame with `localCheckpoint()`, and without an explicit release the
 * superseded rounds' blocks pile up in executor storage — O(rounds) ×
 * edge-list copies, which at 100 TB graph scale evicts useful cache
 * long before the driver GC's ContextCleaner gets around to them
 * (r6 verdict item 6). `release` frees a checkpointed frame's blocks
 * eagerly so live storage is the current round plus the one being
 * built — 2 copies, independent of peel depth.
 */
object Checkpoints {

  /** Free the executor-storage blocks behind a `localCheckpoint()`ed
   *  frame. Finds every [[LogicalRDD]] leaf in the analyzed plan (not
   *  just a bare root), so a projection/filter wrapper added over the
   *  checkpointed frame by a future refactor is still released rather
   *  than silently leaking O(rounds) storage (ADVICE r7). No-op for
   *  frames with no checkpoint-backed leaf, so callers can release
   *  unconditionally in loop epilogues. Non-blocking: the removal
   *  races nothing — the caller has already checkpointed the
   *  successor round. Callers release SUPERSEDED frames only: every
   *  checkpoint leaf under the frame is freed, so do not release a
   *  frame that shares a live checkpoint with one still in use. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    }

  /** The storage-registered RDD ids behind a checkpointed frame —
   *  spec hook for asserting a round's blocks were actually dropped
   *  from `sc.getPersistentRDDs`. */
  def rddIds(df: DataFrame): Seq[Int] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd.id }

  /** First checkpoint-backed RDD id, if any (legacy spec hook). */
  def rddId(df: DataFrame): Option[Int] = rddIds(df).headOption
}

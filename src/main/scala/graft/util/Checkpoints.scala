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
   *  frame. No-op for frames that aren't checkpoint-backed (their
   *  plan root is not the materialized [[LogicalRDD]]), so callers
   *  can release unconditionally in loop epilogues. Non-blocking:
   *  the removal races nothing — the caller has already checkpointed
   *  the successor round. */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _              => ()
  }

  /** The storage-registered RDD id behind a checkpointed frame, if
   *  any — spec hook for asserting a round's blocks were actually
   *  dropped from `sc.getPersistentRDDs`. */
  def rddId(df: DataFrame): Option[Int] = df.queryExecution.analyzed match {
    case lr: LogicalRDD => Some(lr.rdd.id)
    case _              => None
  }
}

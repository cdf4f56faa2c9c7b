package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful per-transaction tracking with `flatMapGroupsWithState` —
 * the Spark-native version of the reference's worker-lifetime
 * `Map<Timestamp, HashSet<Long>>` (reference
 * `WorkerRunnable.java:37,58,137-144`, SURVEY §3.4 "unbounded state"):
 * instead of a map that grows forever and is only ever read for its
 * max, each transaction keeps O(1) state (count, max event time) and
 * is EVICTED by event-time timeout once the watermark passes — bounded
 * state at any scale.
 *
 * Emits one [[TxnSummary]] per transaction when the transaction goes
 * quiet (watermark passes its last event + the configured gap), i.e.
 * "this transaction is fully extracted, its commit timestamp is X".
 */
object TxnTracker {

  final case class TxnEvent(userId: Long, ts: Timestamp, eventId: Long)
  final case class TxnState(nEvents: Long, maxTsMs: Long, minId: Long,
                            maxId: Long)
  final case class TxnSummary(userId: Long, nEvents: Long,
                              commitTs: Timestamp, minEventId: Long,
                              maxEventId: Long)

  def track(events: Dataset[TxnEvent]): Dataset[TxnSummary] = {
    implicit val stateEnc = Encoders.product[TxnState]
    implicit val outEnc = Encoders.product[TxnSummary]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[TxnState, TxnSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[TxnEvent], state: GroupState[TxnState]) =>
          if (state.hasTimedOut) {
            // watermark passed: the transaction is fully extracted
            val s = state.get
            state.remove()
            Iterator.single(TxnSummary(userId, s.nEvents,
              new Timestamp(s.maxTsMs), s.minId, s.maxId))
          } else {
            val prev = state.getOption.getOrElse(
              TxnState(0L, Long.MinValue, Long.MaxValue, Long.MinValue))
            val next = rows.foldLeft(prev) { (acc, e) =>
              TxnState(acc.nEvents + 1, math.max(acc.maxTsMs, e.ts.getTime),
                math.min(acc.minId, e.eventId), math.max(acc.maxId, e.eventId))
            }
            state.update(next)
            // quiet period: 1 min of event time past the last event
            state.setTimeoutTimestamp(next.maxTsMs + 60000L)
            Iterator.empty
          }
      }
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming event-type transition counting — the live version of
 * `CdcOps.transitionMatrix`. A per-batch window `lag` would DROP every
 * transition that spans a micro-batch boundary (the previous event
 * lives in the prior batch); instead each user carries exactly one
 * event — the latest seen — as `flatMapGroupsWithState` state, so the
 * boundary-crossing pair is emitted when its successor arrives.
 *
 * Ordering contract: rows are sorted by `(ts, eventId)` *within* each
 * micro-batch, and batches themselves arrive in offset order from the
 * CDC source (ranges `(min, max]` advance monotonically —
 * reference `CoordinatorRunnable.java:87-92`), so the reconstructed
 * per-user sequence equals the batch operator's whenever event time is
 * consistent with offsets. A same-user event that arrives in a LATER
 * batch with an EARLIER timestamp (out-of-order beyond a batch) is
 * counted in arrival order — the streaming-vs-batch difference is
 * confined to such stragglers.
 *
 * State per user is O(1) (one `LastEvent`), evicted by event-time
 * timeout once the watermark passes `idleEvictMs` past the user's last
 * event — bounded by *active* users, not by history, at any scale.
 * Emitted rows are per-batch per-user pair counts; they sum to the
 * global matrix (counts are trivially mergeable), so a `foreachBatch`
 * consumer can fold them into a store with one tiny upsert per pair.
 */
object TransitionTracker {

  final case class TEvent(userId: Long, ts: Timestamp, eventId: Long,
                          eventType: String)
  final case class LastEvent(tsMs: Long, eventId: Long, eventType: String)
  final case class TransitionCount(userId: Long, fromType: String,
                                   toType: String, n: Long)

  def track(events: Dataset[TEvent],
            idleEvictMs: Long = 3600000L): Dataset[TransitionCount] = {
    implicit val stateEnc = Encoders.product[LastEvent]
    implicit val outEnc = Encoders.product[TransitionCount]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[LastEvent, TransitionCount](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[TEvent], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            // idle user: drop the carried event, emit nothing — a new
            // event after eviction starts a fresh sequence
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toArray.sortBy(e => (e.ts.getTime, e.eventId))
            val carried = state.getOption.map(l => l.eventType).toSeq
            val types = carried ++ batch.map(_.eventType)
            val counts = types.iterator.sliding(2).withPartial(false)
              .foldLeft(Map.empty[(String, String), Long]) { (m, pair) =>
                val k = (pair.head, pair.last)
                m.updated(k, m.getOrElse(k, 0L) + 1L)
              }
            val last = batch.last
            state.update(LastEvent(last.ts.getTime, last.eventId,
              last.eventType))
            // flatMapGroupsWithState does NOT drop late rows, so a
            // straggler older than watermark + idleEvictMs would make
            // this timeout non-future and throw, killing the query —
            // clamp to just past the current watermark instead
            state.setTimeoutTimestamp(math.max(
              last.ts.getTime + idleEvictMs,
              state.getCurrentWatermarkMs() + 1))
            counts.iterator.map { case ((f, to), n) =>
              TransitionCount(userId, f, to, n)
            }
          }
      }
  }
}

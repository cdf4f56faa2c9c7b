package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming counterpart of [[graft.operators.TimeSeries.ewmaSmooth]]:
 * a per-series truncated half-life EWMA maintained incrementally with
 * `flatMapGroupsWithState`. State per series is the last ≤ `Lags`
 * quantized values — O(1) bytes per key regardless of stream length —
 * and one smoothed point is emitted per input event, with exactly the
 * batch operator's arithmetic (weights 2^(Lags−1−k) over the lags
 * that exist, truncating division), so for in-order arrival the
 * stream output is row-identical to the batch output
 * (spec-pinned equality).
 *
 * Within a micro-batch the group's rows are sorted by (ts, event_id)
 * before folding — the same total order the batch operator uses.
 * Cross-batch reordering is governed by the watermark as usual:
 * an event older than an already-folded batch would extend the
 * series out of order (the standard stateful-streaming contract, same
 * as the reference's running watermark which also folds in arrival
 * order — reference `WorkerRunnable.java:145-150`).
 *
 * Idle series are evicted by event-time timeout (`idleTimeoutMs`
 * past the series' last event), keeping total state proportional to
 * ACTIVE series, not ever-seen series.
 */
object StreamingEwma {

  final case class EwmaEvent(userId: Long, ts: Timestamp, eventId: Long,
                             value: Double)
  final case class EwmaState(lags: List[Long], maxTsMs: Long)
  final case class EwmaPoint(userId: Long, eventId: Long, valueQ20: Long,
                             ewmaQ20: Long, nLags: Long)

  val Lags = 8

  /** One smoothed point for the value just pushed onto `lags`
    * (most-recent-first). Shared fold kernel — the spec pins it to
    * the batch operator's output. */
  private def point(userId: Long, eventId: Long,
                    lags: List[Long]): EwmaPoint = {
    val weighted = lags.take(Lags).zipWithIndex
    val num = weighted.map { case (q, k) => q << (Lags - 1 - k) }.sum
    val den = weighted.map { case (_, k) => 1L << (Lags - 1 - k) }.sum
    EwmaPoint(userId, eventId, lags.head, num / den, weighted.size.toLong)
  }

  def smooth(events: Dataset[EwmaEvent],
             idleTimeoutMs: Long = 3600000L): Dataset[EwmaPoint] = {
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val outEnc = Encoders.product[EwmaPoint]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EwmaEvent],
         state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle series: drop its lag buffer
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(EwmaState(Nil, Long.MinValue))
            // batch-order fold: the same (ts, event_id) total order as
            // the batch operator's window sort. getTime alone is
            // millisecond-truncated — include the sub-second nanos so
            // microsecond timestamps order exactly like the window's
            // floorDiv, not /: plain division truncates toward zero
            // and mis-orders pre-1970 sub-second pairs
            val ordered = rows.toSeq.sortBy(e =>
              (Math.floorDiv(e.ts.getTime, 1000L), e.ts.getNanos,
                e.eventId))
            var lags = prev.lags
            var maxTs = prev.maxTsMs
            val out = ordered.map { e =>
              lags = (math.floor(e.value * 1048576.0).toLong :: lags)
                .take(Lags)
              maxTs = math.max(maxTs, e.ts.getTime)
              point(userId, e.eventId, lags)
            }
            state.update(EwmaState(lags, maxTs))
            state.setTimeoutTimestamp(maxTs + idleTimeoutMs)
            out.iterator
          }
      }
  }
}

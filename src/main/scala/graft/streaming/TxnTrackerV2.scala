package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.streaming.TxnTracker.{TxnEvent, TxnState, TxnSummary}

/**
 * Per-transaction tracking on Spark 4's arbitrary-stateful-processing
 * v2 API (`transformWithState` + [[StatefulProcessor]]): the same
 * semantics as [[TxnTracker]] (bounded per-txn state, summary emitted
 * when the watermark passes the transaction's quiet period) expressed
 * with typed `ValueState` and explicit event-time timers — the modern
 * replacement for `flatMapGroupsWithState`'s single-blob state.
 * Requires the RocksDB state store provider.
 */
class TxnStatefulProcessor(quietPeriodMs: Long = 60000L)
    extends StatefulProcessor[Long, TxnEvent, TxnSummary] {

  @transient private var state:
      org.apache.spark.sql.streaming.ValueState[TxnState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[TxnState]("txn",
      Encoders.product[TxnState], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[TxnEvent],
                               timerValues: TimerValues): Iterator[TxnSummary] = {
    val prev = Option(state.get()).getOrElse(
      TxnState(0L, Long.MinValue, Long.MaxValue, Long.MinValue))
    val hadTimer = prev.nEvents > 0
    val next = rows.foldLeft(prev) { (acc, e) =>
      TxnState(acc.nEvents + 1, math.max(acc.maxTsMs, e.ts.getTime),
        math.min(acc.minId, e.eventId), math.max(acc.maxId, e.eventId))
    }
    state.update(next)
    // slide the quiet-period timer to the newest event
    if (hadTimer) getHandle.deleteTimer(prev.maxTsMs + quietPeriodMs)
    getHandle.registerTimer(next.maxTsMs + quietPeriodMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[TxnSummary] = {
    val s = state.get()
    state.clear()
    if (s == null) Iterator.empty
    else Iterator.single(TxnSummary(key, s.nEvents, new Timestamp(s.maxTsMs),
      s.minId, s.maxId))
  }
}

object TxnTrackerV2 {
  def track(events: Dataset[TxnEvent],
            quietPeriodMs: Long = 60000L): Dataset[TxnSummary] = {
    implicit val outEnc = Encoders.product[TxnSummary]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .transformWithState(new TxnStatefulProcessor(quietPeriodMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

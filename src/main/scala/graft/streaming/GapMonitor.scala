package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming offset-gap monitor — the continuous form of
 * [[graft.operators.CdcOps.gapDetection]] and the live integrity check
 * for the reference's `(min, max]` extraction contract
 * (`CoordinatorRunnable.java:87-92`): every offset the coordinator
 * hands out must eventually be extracted exactly once.
 *
 * Per key (table/stream), bounded state tracks the high-water offset
 * plus the set of still-missing ids below it. Each micro-batch emits:
 *  - `gap` when an offset arrives above `highWater + 1` (the skipped
 *    ids join the missing set),
 *  - `fill` when a previously-missing offset arrives late,
 *  - `lost` when the missing set exceeds `maxTracked` and the oldest
 *    ids are evicted (state stays bounded no matter how broken the
 *    upstream is — unlike the reference's unbounded maps, §3.4).
 */
object GapMonitor {

  final case class Offset(source: String, offset: Long)
  final case class GapState(highWater: Long, missing: List[Long])
  final case class GapEvent(source: String, kind: String, fromId: Long,
                            toId: Long)

  def monitor(offsets: Dataset[Offset], maxTracked: Int = 10000)
      : Dataset[GapEvent] = {
    implicit val stateEnc: Encoder[GapState] = Encoders.product[GapState]
    implicit val outEnc: Encoder[GapEvent] = Encoders.product[GapEvent]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    offsets.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[Offset], state: GroupState[GapState]) =>
          val st = state.getOption.getOrElse(GapState(Long.MinValue, Nil))
          var high = st.highWater
          var missing = scala.collection.mutable.SortedSet(st.missing: _*)
          val out = scala.collection.mutable.ListBuffer[GapEvent]()
          for (off <- rows.map(_.offset).toSeq.sorted) {
            if (high == Long.MinValue) high = off // first offset = baseline
            else if (off > high + 1) {
              out += GapEvent(source, "gap", high + 1, off - 1)
              ((high + 1) until off).foreach(missing.add)
              high = off
            } else if (off > high) {
              high = off
            } else if (missing.remove(off)) {
              out += GapEvent(source, "fill", off, off)
            } // duplicate redelivery below highWater: ignore
          }
          while (missing.size > maxTracked) {
            val oldest = missing.head
            missing.remove(oldest)
            out += GapEvent(source, "lost", oldest, oldest)
          }
          state.update(GapState(high, missing.toList))
          out.iterator
      }
  }
}

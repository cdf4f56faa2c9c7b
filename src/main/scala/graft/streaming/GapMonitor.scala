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
 *  - `lost` when ids stop being tracked: a jump wider than `maxTracked`
 *    records the untracked prefix as one `lost` RANGE immediately, and
 *    overflow of the accumulated missing set evicts oldest ids
 *    individually. Persistent STATE per key is O(maxTracked) no matter
 *    how broken the upstream is (an offset-scheme reset jumping by 2⁵⁰
 *    costs one event, not 2⁵⁰ insertions) — unlike the reference's
 *    unbounded maps, §3.4. Transient work per micro-batch is
 *    O(batch·log batch) for the key's offsets (they are buffered and
 *    sorted so an in-order batch emits no spurious gap+fill pairs); if
 *    single-key batches big enough to strain one task's memory are
 *    expected, cap them at the source (`maxEventsPerTrigger`) — rate
 *    limiting is the backpressure knob here, exactly as in the Kafka
 *    source.
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
          val offs = rows.map(_.offset).toArray
          java.util.Arrays.sort(offs)
          for (off <- offs) {
            if (high == Long.MinValue) high = off // first offset = baseline
            else if (off > high + 1) {
              out += GapEvent(source, "gap", high + 1, off - 1)
              // track at most the newest maxTracked missing ids of this
              // gap; a wider jump records the rest as lost outright
              // (never materialize an arbitrary-width range)
              val trackFrom = math.max(high + 1, off - maxTracked)
              if (trackFrom > high + 1)
                out += GapEvent(source, "lost", high + 1, trackFrom - 1)
              var i = trackFrom
              while (i < off) { missing.add(i); i += 1 }
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

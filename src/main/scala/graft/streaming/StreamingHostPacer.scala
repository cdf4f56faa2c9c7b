package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Per-host crawl-delay pacing — the second half of frontier
 * politeness: [[graft.operators.Robots.robotsAllowed]] decides
 * WHETHER a URL may be fetched, this decides WHEN. Each host's
 * `Crawl-delay` (from [[graft.operators.Robots.robotsHostIndex]])
 * becomes a minimum EVENT-TIME gap between admitted fetches of that
 * host: the first in-gap arrival admits and advances the host's
 * last-admit mark; arrivals inside the gap are flagged `admit=false`
 * with the remaining `wait_ms` — the pacer FLAGS rather than drops
 * (the [[StreamingUrlSeen]] philosophy): the caller re-queues
 * deferred URLs with their wait, so no frontier entry is lost.
 *
 * Event-time, not processing-time, by design: verdicts are
 * deterministic and replayable (a crash-and-restart re-derives the
 * same admits), and the in-batch semantics are batch-split
 * independent — deterministic (ts, doc_id) order, gap walk against
 * the state's own mark, stale re-check, clamped timeout — the same
 * discipline as the rest of the streaming family.
 *
 * State: ONE long (last admit) per host live in the horizon (clamped
 * per host to at least its own crawl-delay, so a 120 s delay outlives
 * a 60 s horizon), evicted
 * by event-time timeout past the last sighting — memory tracks
 * active-host count, never frontier history. Hosts with no
 * crawl-delay (or absent from the index) admit unconditionally and
 * still cost one state row only while active.
 *
 * Composition contract: robots ADMIT (stream-static join, stateless)
 * composes with the pacer in ONE query; the [[StreamingUrlSeen]]
 * dedup screen is a SEPARATE query (Spark allows one
 * flatMapGroupsWithState per streaming query) — the same two-query
 * frontier architecture the URL family already documents, now three
 * stages: seen-screen query → politeness query (admit + pace) →
 * fetch.
 */
object StreamingHostPacer {

  final case class PaceRow(docId: Long, ts: Timestamp, host: String,
                           delayMs: Long)
  final case class PaceVerdict(docId: Long, ts: Timestamp, host: String,
                               admit: Boolean, wait_ms: Long)
  final case class PaceState(lastAdmitMs: Long)

  /** Pace verdicts over a `(doc_id, tsCol, urlCol)` stream against
    * the static host index's `crawl_delay` (seconds, null = none):
    * one output row per input row. Append-mode stateful map. */
  def paced(urls: DataFrame, hostIndex: DataFrame,
            delay: String = "10 seconds", horizonMs: Long = 60000L,
            tsCol: String = "event_time", urlCol: String = "url")
      : Dataset[PaceVerdict] = {
    implicit val rowEnc = Encoders.product[PaceRow]
    implicit val stateEnc = Encoders.product[PaceState]
    implicit val outEnc = Encoders.product[PaceVerdict]
    urls
      .withColumn("host", graft.operators.Robots.urlHost(col(urlCol)))
      .join(hostIndex.select(col("host"), col("crawl_delay")),
        Seq("host"), "left_outer")
      .select(col("doc_id").as("docId"), col(tsCol).as("ts"),
        col("host"),
        (coalesce(col("crawl_delay"), lit(0L)) * 1000L).as("delayMs"))
      .withWatermark("ts", delay)
      .as[PaceRow]
      .groupByKey(_.host)(Encoders.STRING)
      .flatMapGroupsWithState[PaceState, PaceVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[PaceRow], state: GroupState[PaceState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle host: the gap has long lapsed
            Iterator.empty
          } else {
            val ordered = rows.toSeq.sortBy(r =>
              (Math.floorDiv(r.ts.getTime, 1000L), r.ts.getNanos, r.docId))
            // The retention horizon must cover the politeness gap: a
            // host with Crawl-delay > horizonMs would otherwise have
            // its last-admit mark evicted mid-gap and get admitted
            // every horizonMs — the gap silently unenforced. delayMs
            // rides on every row (static per host), so clamp here.
            val effHorizonMs = math.max(horizonMs,
              ordered.headOption.map(_.delayMs).getOrElse(0L))
            val stale = state.getOption.exists(
              _.lastAdmitMs + effHorizonMs < state.getCurrentWatermarkMs())
            var last = if (!state.exists || stale) Long.MinValue
                       else state.get.lastAdmitMs
            var maxTs = Long.MinValue
            val out = ordered.map { r =>
              val t = r.ts.getTime
              maxTs = math.max(maxTs, t)
              if (r.delayMs <= 0L) PaceVerdict(r.docId, r.ts, r.host,
                admit = true, wait_ms = 0L)
              else if (last == Long.MinValue || t - last >= r.delayMs) {
                last = t
                PaceVerdict(r.docId, r.ts, r.host, admit = true,
                  wait_ms = 0L)
              } else PaceVerdict(r.docId, r.ts, r.host, admit = false,
                wait_ms = last + r.delayMs - t)
            }
            if (last != Long.MinValue) state.update(PaceState(last))
            state.setTimeoutTimestamp(math.max(
              math.max(maxTs, last) + effHorizonMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}

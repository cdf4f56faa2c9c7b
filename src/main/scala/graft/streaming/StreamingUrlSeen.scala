package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming URL first-seen screen — the crawl-FRONTIER dedup that runs
 * in front of fetch/extract, completing the URL-identity story the way
 * [[StreamingNearDup]] completes content identity: the batch side
 * dedups what was stored (`dedup_url_canonical`), this screens what is
 * about to be fetched. Keys are
 * [[graft.operators.TextOps.urlCanonical]] — stream and batch
 * canonicalize through ONE code path, so a URL admitted here lands in
 * the same exact-dedup group downstream.
 *
 * Per canonical key, a `flatMapGroupsWithState` marks the
 * first-in-horizon arrival `first = true` and every later arrival
 * within the horizon `false` (suppress: already fetched or in flight).
 * The screen flags rather than drops — the caller routes, and a
 * re-crawl policy is exactly "revisit when the horizon lapses": state
 * is one marker per live canonical URL, evicted by event-time timeout
 * `horizonMs` past the last sighting, so memory tracks arrival rate ×
 * horizon, never frontier history. A URL revisited after its marker
 * aged out is re-admitted — that IS the re-crawl interval, not a leak.
 *
 * In-batch semantics mirror [[StreamingNearDup.ownership]] row for
 * row (deterministic (ts, doc_id) order; in-batch horizon gaps
 * re-admit; stale-state re-check; watermark-clamped timeout) — the
 * verdict never depends on how arrivals split across micro-batches.
 */
object StreamingUrlSeen {

  final case class UrlRow(docId: Long, ts: Timestamp, canon: String)
  final case class UrlSeen(docId: Long, ts: Timestamp, canon: String,
                           first: Boolean)
  final case class SeenState(maxTsMs: Long)

  /** First-seen stream over `(doc_id, tsCol, urlCol)`: one output row
    * per input row, `first` true iff this row is its canonical URL's
    * first sighting within the horizon. Append-mode stateful map. */
  def firstSeen(urls: DataFrame, delay: String = "10 seconds",
                horizonMs: Long = 10000L, tsCol: String = "event_time",
                urlCol: String = "url"): Dataset[UrlSeen] = {
    implicit val rowEnc = Encoders.product[UrlRow]
    implicit val stateEnc = Encoders.product[SeenState]
    implicit val outEnc = Encoders.product[UrlSeen]
    urls.select(col("doc_id").as("docId"), col(tsCol).as("ts"),
        graft.operators.TextOps.urlCanonical(col(urlCol)).as("canon"))
      .withWatermark("ts", delay)
      .as[UrlRow]
      .groupByKey(_.canon)(Encoders.STRING)
      .flatMapGroupsWithState[SeenState, UrlSeen](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[UrlRow], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past the horizon: re-admit on revisit
            Iterator.empty
          } else {
            val ordered = rows.toSeq.sortBy(r =>
              (Math.floorDiv(r.ts.getTime, 1000L), r.ts.getNanos, r.docId))
            // state whose horizon already passed the watermark is stale
            // even if its timeout callback hasn't fired yet (the batch
            // can both time the key out AND carry new rows for it)
            val stale = state.getOption.exists(
              _.maxTsMs + horizonMs < state.getCurrentWatermarkMs())
            var last = if (!state.exists || stale) Long.MinValue
                       else state.get.maxTsMs
            val out = ordered.map { r =>
              val t = r.ts.getTime
              val first = last == Long.MinValue || t - last > horizonMs
              last = math.max(last, t)
              UrlSeen(r.docId, r.ts, r.canon, first)
            }
            state.update(SeenState(last))
            // clamp: a straggler's maxTs+horizon can land behind the
            // watermark and an unclamped setTimeoutTimestamp throws
            state.setTimeoutTimestamp(math.max(last + horizonMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}

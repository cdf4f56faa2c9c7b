package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/**
 * Streaming REVISIT classification — the live twin of
 * [[graft.operators.Robots.revisitClassify]], completing the recrawl
 * cycle's stream leg the way [[StreamingUrlSeen]] completes frontier
 * identity: the batch side classifies a fetch WAVE against a stored
 * validator table; this classifies a fetch STREAM against per-URL
 * state, so an ingest pipeline can route revisits (store a pointer,
 * not bytes) the moment the response lands.
 *
 * Per URL, a `flatMapGroupsWithState` carries the last stored content
 * digest. Verdicts mirror the batch operator row for row:
 *  - no live state + 2xx → `new` (the digest becomes the store);
 *  - no live state + anything else → `error` (a 304 without stored
 *    validators is a protocol anomaly — nothing conditional was sent);
 *  - 304 → `unchanged_304`; 2xx same digest → `unchanged_digest`
 *    (both refresh the sighting, neither rewrites the digest);
 *  - 2xx different digest → `changed` (the new digest replaces the
 *    store); anything else → `error` (state untouched).
 *
 * State is ONE digest per live URL, evicted by event-time timeout
 * `horizonMs` past the last sighting — memory tracks fetch rate ×
 * horizon, never crawl history; a URL refetched after its state aged
 * out classifies `new` again, which IS the retention contract (the
 * durable validator store is the batch side's job). In-batch
 * semantics follow the family rules: deterministic (ts, doc_id)
 * order, stale-state re-check against the watermark, clamped timeout.
 */
object StreamingRevisit {

  final case class FetchRow(docId: Long, ts: Timestamp, url: String,
                            status: Int, digest: String)
  final case class RevisitVerdict(docId: Long, ts: Timestamp,
                                  url: String, status: Int,
                                  verdict: String, is_revisit: Boolean)
  final case class DigestState(digest: String, maxTsMs: Long)

  /** Verdict stream over `(doc_id, tsCol, urlCol, statusCol,
    * digestCol)`: one output row per fetch event. Append-mode
    * stateful map. */
  def classify(fetches: DataFrame, delay: String = "10 seconds",
               horizonMs: Long = 10000L, tsCol: String = "event_time",
               urlCol: String = "url", statusCol: String = "status",
               digestCol: String = "digest"): Dataset[RevisitVerdict] = {
    implicit val rowEnc = Encoders.product[FetchRow]
    implicit val stateEnc = Encoders.product[DigestState]
    implicit val outEnc = Encoders.product[RevisitVerdict]
    fetches.select(col("doc_id").as("docId"), col(tsCol).as("ts"),
        col(urlCol).as("url"), col(statusCol).cast("int").as("status"),
        col(digestCol).as("digest"))
      .withWatermark("ts", delay)
      .as[FetchRow]
      .groupByKey(_.url)(Encoders.STRING)
      .flatMapGroupsWithState[DigestState, RevisitVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[FetchRow],
         state: GroupState[DigestState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past the horizon: next fetch is `new`
            Iterator.empty
          } else {
            val ordered = rows.toSeq.sortBy(r =>
              (Math.floorDiv(r.ts.getTime, 1000L), r.ts.getNanos,
                r.docId))
            val stale = state.getOption.exists(
              _.maxTsMs + horizonMs < state.getCurrentWatermarkMs())
            var cur: Option[DigestState] =
              if (!state.exists || stale) None else Some(state.get)
            val out = ordered.map { r =>
              val t = r.ts.getTime
              // an in-batch gap past the horizon ages the state out
              // exactly as the timeout would have between batches
              val live = cur.filter(s => t - s.maxTsMs <= horizonMs)
              val ok2xx = r.status >= 200 && r.status <= 299
              val verdict = live match {
                case None if ok2xx => "new"
                case None => "error"
                case Some(_) if r.status == 304 => "unchanged_304"
                case Some(s) if ok2xx && r.digest == s.digest =>
                  "unchanged_digest"
                case Some(_) if ok2xx => "changed"
                case Some(_) => "error"
              }
              cur = verdict match {
                case "new" | "changed" => Some(DigestState(r.digest, t))
                case "unchanged_304" | "unchanged_digest" =>
                  live.map(s => DigestState(s.digest, t))
                case _ => // error: keep state, refresh nothing
                  cur
              }
              RevisitVerdict(r.docId, r.ts, r.url, r.status, verdict,
                verdict == "unchanged_304" ||
                  verdict == "unchanged_digest")
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(math.max(s.maxTsMs + horizonMs,
                  state.getCurrentWatermarkMs() + 1))
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
      }
  }
}

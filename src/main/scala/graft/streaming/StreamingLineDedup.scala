package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming cross-document LINE-level dedup — the C4/RefinedWeb
 * boilerplate rule ([[graft.operators.TextOps.lineDedup]]) for a live
 * curation pipeline (r11 verdict item 6). Stream and batch share ONE
 * key contract: lines split on `\n`, trimmed keys, short keys (<
 * `minLineChars`) exempt from counting and always kept.
 *
 * FORWARD-ONLY semantics (the honest streaming contract, documented
 * rather than papered over): the batch rule drops ALL occurrences of
 * a key whose document frequency exceeds `maxDf` — retroactive by
 * nature. A stream cannot unsend rows, so here a line drops once its
 * key's OBSERVED df within the horizon exceeds `maxDf`: the first
 * `maxDf` sighting docs keep their copy (they were emitted before the
 * key crossed the threshold), every later doc's copy drops. A
 * periodic batch [[graft.operators.TextOps.lineDedup]] pass over the
 * stored corpus reconciles the early copies — the same two-query
 * architecture as the URL family (frontier screen now,
 * `dedup_url_canonical` on the store).
 *
 * State discipline mirrors [[StreamingUrlSeen]] row for row: one
 * `(df, maxTs)` per line key LIVE IN THE HORIZON, evicted by
 * event-time timeout `horizonMs` past the last sighting — memory
 * tracks arrival rate × horizon, never corpus history. Eviction
 * resets the count: the horizon IS the boilerplate memory, a key must
 * recur within it to accumulate df (true boilerplate — cookie
 * banners, nav footers — recurs every batch and never evicts).
 * In-batch semantics are batch-split-independent: deterministic
 * (ts, doc_id) order, stale-state re-check, watermark-clamped
 * timeout; repeated occurrences of a key within ONE doc count that
 * doc once and share its verdict.
 */
object StreamingLineDedup {

  final case class LineRow(docId: Long, ts: Timestamp, pos: Int,
                           line: String, key: String)
  final case class LineVerdict(docId: Long, ts: Timestamp, pos: Int,
                               line: String, keep: Boolean, line_df: Long)
  final case class DfState(df: Long, maxTsMs: Long)

  /** Per-line keep/drop verdicts over a `(doc_id, tsCol, textCol)`
    * document stream: one output row per input line. Append-mode
    * stateful map for counted keys; short lines bypass state entirely
    * (keep = true, line_df = 0) via a stateless union branch — the
    * same routing the batch operator uses for its skew discipline. */
  def verdicts(docs: DataFrame, maxDf: Int = 2, minLineChars: Int = 10,
               delay: String = "10 seconds", horizonMs: Long = 10000L,
               tsCol: String = "event_time", textCol: String = "text")
      : Dataset[LineVerdict] = {
    implicit val rowEnc = Encoders.product[LineRow]
    implicit val stateEnc = Encoders.product[DfState]
    implicit val outEnc = Encoders.product[LineVerdict]
    val lines = docs.select(col("doc_id").as("docId"),
        col(tsCol).as("ts"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("pos", "line")))
      .withColumn("key", trim(col("line")))
    val exempt = lines.filter(length(col("key")) < minLineChars)
      .select(col("docId"), col("ts"), col("pos"), col("line"),
        lit(true).as("keep"), lit(0L).as("line_df"))
      .as[LineVerdict]
    val counted = lines.filter(length(col("key")) >= minLineChars)
      .withWatermark("ts", delay)
      .as[LineRow]
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[DfState, LineVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[LineRow], state: GroupState[DfState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past the horizon: df resets
            Iterator.empty
          } else {
            val ordered = rows.toSeq.sortBy(r =>
              (Math.floorDiv(r.ts.getTime, 1000L), r.ts.getNanos,
                r.docId, r.pos))
            // state whose horizon already passed the watermark is
            // stale even if its timeout hasn't fired yet
            val stale = state.getOption.exists(
              _.maxTsMs + horizonMs < state.getCurrentWatermarkMs())
            var df = if (!state.exists || stale) 0L else state.get.df
            var maxTs = if (!state.exists || stale) Long.MinValue
                        else state.get.maxTsMs
            // one increment per DISTINCT doc in arrival order; all of
            // a doc's occurrences share its verdict. The GAP WALK is
            // the [[StreamingUrlSeen]] discipline: an arrival more
            // than the horizon past the key's last sighting starts a
            // fresh count — the watermark (and so the timeout) lags a
            // batch, and eviction semantics must not depend on when
            // the callback happens to fire
            val out = Seq.newBuilder[LineVerdict]
            // once-per-doc counting via a per-invocation doc → df map
            // (NOT adjacent-row comparison: a doc whose rows arrive in
            // one batch under TWO timestamps sorts non-adjacent and
            // would double-count). The map holds this batch's distinct
            // docs for this key — bounded by batch content, not state.
            val docDf = scala.collection.mutable.Map.empty[Long, Long]
            ordered.foreach { r =>
              val t = r.ts.getTime
              if (maxTs != Long.MinValue && t - maxTs > horizonMs) {
                df = 0L; docDf.clear() // horizon lapsed: fresh count
              }
              val mine = docDf.getOrElseUpdate(r.docId, { df += 1L; df })
              maxTs = math.max(maxTs, t)
              out += LineVerdict(r.docId, r.ts, r.pos, r.line,
                keep = mine <= maxDf, line_df = mine)
            }
            state.update(DfState(df, maxTs))
            state.setTimeoutTimestamp(math.max(maxTs + horizonMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
    counted.union(exempt)
  }
}

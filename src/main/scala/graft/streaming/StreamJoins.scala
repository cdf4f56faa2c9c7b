package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked stream-stream joins — the streaming form of the S4
 * commit-timestamp enrichment (reference `WorkerRunnable.java:130-140`
 * looked commit timestamps up per row, N+1-style; the batch operator
 * `CdcOps.enrichCommitTs` turned that into one broadcast join; this is
 * the third form, for when BOTH sides arrive continuously).
 *
 * Spark buffers both sides in state keyed by the join key; the event-
 * time range condition plus the two watermarks bound that state — a
 * commit record can be evicted once the watermark passes
 * `commit_ts`'s largest possible matching event window, so state
 * tracks arrival rate × (watermark delay + maxDelay), never history.
 * At 100 TB/day this is the only join shape that works: no side is
 * ever complete, so neither can broadcast or be a static build side.
 */
object StreamJoins {

  /**
   * Inner-join change events (txid, event time `ts`) with commit
   * records (`txid`, `commit_ts`), keeping pairs whose commit lands
   * within `[ts, ts + maxDelay]` — a transaction commits after its
   * changes, within the delay bound. Both inputs MUST be streaming
   * frames; both get event-time watermarks so the state store evicts.
   */
  def enrichWithCommitStream(events: DataFrame, commits: DataFrame,
                             maxDelay: String = "10 minutes",
                             delayThreshold: String = "5 minutes"): DataFrame = {
    val e = events.withWatermark("ts", delayThreshold)
    val c = commits.withWatermark("commit_ts", delayThreshold)
    e.join(c,
      e("txid") === c("txid") &&
        c("commit_ts") >= e("ts") &&
        c("commit_ts") <= e("ts") + expr(s"INTERVAL $maxDelay"))
      .drop(c("txid"))
  }
}

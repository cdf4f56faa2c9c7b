package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CdcOps
import graft.util.Cols

/**
 * The end-to-end extraction pipeline — the reference's `Client.main`
 * dataflow (SURVEY.md §3.1) as one Structured Streaming job:
 *
 *   changelog source → (watermark) → per-batch commit-ts enrichment
 *   (broadcast join, replacing the N+1 lookups) → pipe-delimited files.
 *
 * The coordinator thread, the bounded queue, N worker threads, and the
 * per-worker chunk files all disappear into the engine: trigger
 * interval ≙ `sleepDuration`, source partitions ≙ `numberOfThread`,
 * one output file per partition ≙ `chunk<i>`, checkpointed offsets ≙
 * the (previously unpersisted) `maxSeqID` ledger.
 */
object ExtractionPipeline {

  /** Open the streaming change log (see [[ChangeLogStream]] options). */
  def readChangeLog(spark: SparkSession, buffer: String,
                    tables: Option[Seq[String]] = None,
                    numPartitions: Int = 4,
                    maxEventsPerTrigger: Long = Long.MaxValue,
                    startAt: String = "earliest"): DataFrame = {
    val r = spark.readStream.format(ChangeLogStream.FormatName)
      .option("buffer", buffer)
      .option("numPartitions", numPartitions)
      .option("maxEventsPerTrigger", maxEventsPerTrigger)
      .option("startAt", startAt)
    tables.foldLeft(r)((b, t) => b.option("tables", t.mkString(",")))
      .load()
  }

  /** The streamed rows rendered in `chunk` pipe format (S5 fidelity):
    * keyed by offset, timestamps as epoch micros, money via DECIMAL. */
  def pipeFormat(stream: DataFrame): DataFrame =
    stream.select(col("event_id"),
      CdcOps.pipeLine(Seq(col("event_id"), Cols.epochUs(col("ts")),
        col("user_id"), col("event_type"),
        col("value").cast("decimal(18,2)"), col("props"))).as("line"))

  /**
   * Start the extraction: every micro-batch is enriched with the
   * transaction commit timestamp (distinct txids → broadcast join —
   * the set-oriented replacement for `WorkerRunnable.java:130-144`)
   * and appended as pipe-delimited text, one file per partition.
   * Exactly-once comes from the checkpointed offsets + Spark's
   * transactional file sink.
   */
  def start(stream: DataFrame, outDir: String, checkpointDir: String,
            triggerMs: Long = 1000L,
            watermarkDelay: String = "10 seconds"): StreamingQuery =
    stream
      .withWatermark("ts", watermarkDelay)
      .writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, outDir)
      }
      .start()

  /**
   * One micro-batch of the extraction sink: enrich with the
   * transaction commit timestamp and land the pipe lines under
   * `batch=<id>`. batchId-keyed OVERWRITE is what makes a replayed
   * batch idempotent: after a mid-batch crash the restart re-runs the
   * same batch id over the same checkpointed offset range and the
   * overwrite replaces any partial output whole — no duplicate and no
   * missing line (the reference had no such story: a worker crash
   * mid-chunk lost or duplicated rows, SURVEY §3.4,
   * `CoordinatorRunnable.java:35-42`). [[ExactlyOnceSinkSpec]] kills a
   * batch after a partial write and proves the law.
   */
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String): Unit = {
    val dim = CdcOps.commitTsDim(batch)
    val enriched = CdcOps.enrichCommitTs(batch, dim)
    enriched.select(
        CdcOps.pipeLine(Seq(col("event_id"), Cols.epochUs(col("ts")),
          col("user_id"), col("event_type"),
          col("value").cast("decimal(18,2)"), col("props"),
          Cols.epochUs(col("commit_ts")))).as("line"))
      .write.mode("overwrite").text(s"$outDir/batch=$batchId")
    ()
  }

  /**
   * Deduplicate redelivered change events by offset within the
   * watermark window — upgrades an at-least-once upstream (e.g. a
   * connector that replays on reconnect) to exactly-once downstream
   * without unbounded state: `dropDuplicatesWithinWatermark` evicts
   * seen-offset state once the event-time watermark passes.
   */
  def dedupRedeliveries(stream: DataFrame,
                        watermarkDelay: String = "10 minutes"): DataFrame =
    stream.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /**
   * Stream-stream interval join: correlate two change streams on a
   * key within an event-time window (e.g. "purchase within 1 hour of
   * a click by the same user"). Both sides carry watermarks so the
   * join state is bounded — buffered rows are evicted once the
   * watermark passes the interval.
   */
  def correlate(left: DataFrame, right: DataFrame,
                keyCol: String = "user_id",
                within: String = "1 hour",
                watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
      .select(col(keyCol).as("l_key"), col("ts").as("l_ts"),
        col("event_id").as("l_event_id"), col("event_type").as("l_type"))
    val r = right.withWatermark("ts", watermarkDelay)
      .select(col(keyCol).as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("event_type").as("r_type"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
  }

  /** Streaming per-minute throughput aggregation (T6) with watermarked
    * state eviction — the windowed counters of `WorkerRunnable
    * .java:158-179` without the unbounded maps. */
  def throughputQuery(stream: DataFrame, outputMode: String = "update")
      : DataFrame =
    stream
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_txids"))
      .select(col("window.start").as("minute"), col("n_events"),
        col("n_txids"))
}

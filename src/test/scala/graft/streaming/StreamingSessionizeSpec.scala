package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The batch `CdcOps.sessionize` shape under Structured Streaming:
 * `session_window` + watermark — sessions merge as events arrive
 * (even across micro-batches) and emit exactly once when the
 * watermark passes the session's close (last event + gap). This is
 * the live counterpart of the `cdc_sessionize` oracle query.
 */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  test("streaming session windows merge across batches, emit on close") {
    val input = MemoryStream[(Long, Timestamp)](spark)
    val sessions = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 seconds").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
    val q = sessions.writeStream.format("memory")
      .queryName("live_sessions").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sess").toString)
      .start()
    try {
      // batch 1 opens a session; batch 2 EXTENDS it across the
      // micro-batch boundary (10s < 30s gap)
      input.addData((1L, ts(0)), (1L, ts(5000)))
      q.processAllAvailable()
      input.addData((1L, ts(15000)))
      q.processAllAvailable()
      assert(spark.table("live_sessions").isEmpty) // still open
      // watermark jumps past the close: the merged session emits once
      input.addData((2L, ts(600000)))
      q.processAllAvailable()
      val got = spark.table("live_sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
      assert(got.length == 1)
      val (uid, start, end, n) = got.head
      assert(uid == 1L && n == 3L)
      assert(start == ts(0) && end == ts(15000 + 30000))
    } finally q.stop()
  }
}

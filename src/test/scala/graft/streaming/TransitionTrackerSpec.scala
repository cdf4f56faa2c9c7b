package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.CdcOps
import graft.streaming.TransitionTracker.{TEvent, TransitionCount}

class TransitionTrackerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  test("streaming transitions count across micro-batch boundaries") {
    val input = MemoryStream[TEvent](spark)
    val tracked = TransitionTracker.track(
      input.toDS().withWatermark("ts", "0 seconds").as[TEvent])
    val q = tracked.writeStream.format("memory").queryName("trans")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("trans").toString)
      .start()
    try {
      // batch 1: user 10 sees a,b (out of arrival order within the
      // batch: b has the later ts but is added first); user 20 sees a
      input.addData(
        TEvent(10L, ts(2000), 2L, "b"),
        TEvent(10L, ts(1000), 1L, "a"),
        TEvent(20L, ts(1500), 3L, "a"))
      q.processAllAvailable()
      // batch 2: the a->b pair for user 20 and b->b, b->c for user 10
      // all span the batch boundary via carried state
      input.addData(
        TEvent(10L, ts(3000), 4L, "b"),
        TEvent(10L, ts(4000), 5L, "c"),
        TEvent(20L, ts(3500), 6L, "b"))
      q.processAllAvailable()
      val got = spark.table("trans").as[TransitionCount].collect()
        .groupBy(t => (t.fromType, t.toType))
        .view.mapValues(_.map(_.n).sum).toMap
      // full sequence user 10: a,b,b,c ; user 20: a,b
      val batchEquivalent = CdcOps.transitionMatrix(
        Seq((1L, 10L, ts(1000), "a"), (2L, 10L, ts(2000), "b"),
          (4L, 10L, ts(3000), "b"), (5L, 10L, ts(4000), "c"),
          (3L, 20L, ts(1500), "a"), (6L, 20L, ts(3500), "b"))
          .toDF("event_id", "user_id", "ts", "event_type"))
        .as[(String, String, Long)].collect()
        .map { case (f, to, n) => (f, to) -> n }.toMap
      assert(got == batchEquivalent)
      assert(got == Map(("a", "b") -> 2L, ("b", "b") -> 1L,
        ("b", "c") -> 1L))
    } finally q.stop()
  }

  test("idle users are evicted and restart a fresh sequence") {
    val input = MemoryStream[TEvent](spark)
    val tracked = TransitionTracker.track(
      input.toDS().withWatermark("ts", "0 seconds").as[TEvent],
      idleEvictMs = 1000L)
    val q = tracked.writeStream.format("memory").queryName("trans_evict")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("transe").toString)
      .start()
    try {
      input.addData(TEvent(1L, ts(0), 1L, "a"))
      q.processAllAvailable()
      // push the watermark far past user 1's eviction horizon
      input.addData(TEvent(2L, ts(60000), 2L, "x"))
      q.processAllAvailable()
      input.addData(TEvent(3L, ts(120000), 3L, "x"))
      q.processAllAvailable()
      // user 1 returns: its "a" was evicted, so no a->b pair appears
      input.addData(TEvent(1L, ts(180000), 4L, "b"))
      q.processAllAvailable()
      val got = spark.table("trans_evict").as[TransitionCount].collect()
      assert(got.isEmpty)
    } finally q.stop()
  }

  test("a straggler far behind the watermark cannot kill the query") {
    // Two guards cover the late-straggler path: this Spark version
    // filters rows below the watermark before the state function (so
    // the batch here yields nothing), and for any row that does reach
    // it (e.g. pre-filter versions, or watermark advancing hugely in
    // one batch) the timeout clamp keeps setTimeoutTimestamp in the
    // future instead of throwing. The query must survive either way.
    val input = MemoryStream[TEvent](spark)
    val tracked = TransitionTracker.track(
      input.toDS().withWatermark("ts", "0 seconds").as[TEvent],
      idleEvictMs = 1000L)
    val q = tracked.writeStream.format("memory").queryName("trans_late")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("transl").toString)
      .start()
    try {
      // advance the watermark to ts(100000)
      input.addData(TEvent(1L, ts(100000), 1L, "a"))
      q.processAllAvailable()
      // user 2's only event sits 99 s behind it — beyond the 1 s evict
      // horizon, so last.ts + idleEvictMs < watermark
      input.addData(
        TEvent(2L, ts(1000), 2L, "x"),
        TEvent(2L, ts(1500), 3L, "y"))
      q.processAllAvailable() // must not throw
      val got = spark.table("trans_late").as[TransitionCount].collect()
      // late rows were filtered before the state function: no pairs,
      // no crash, and the query keeps running for on-time data
      assert(got.isEmpty)
      input.addData(
        TEvent(3L, ts(101000), 4L, "p"),
        TEvent(3L, ts(101500), 5L, "q"))
      q.processAllAvailable()
      val after = spark.table("trans_late").as[TransitionCount].collect()
      assert(after.toSeq == Seq(TransitionCount(3L, "p", "q", 1L)))
    } finally q.stop()
  }
}

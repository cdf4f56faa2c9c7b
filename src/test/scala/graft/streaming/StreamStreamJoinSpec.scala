package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/**
 * Stream-stream join behavior: cross-batch matching (a commit arriving
 * batches after its event still joins — both sides buffer in state),
 * the event-time range bound (commits outside [ts, ts+maxDelay] never
 * join), and watermark-based late-input drop (a commit older than the
 * watermark is discarded instead of joining — the bounded-state
 * contract).
 */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("cross-batch match, range bound, and late drop") {
    val ev = MemoryStream[(Long, Timestamp)](spark)
    val cm = MemoryStream[(Long, Timestamp)](spark)
    val joined = StreamJoins.enrichWithCommitStream(
      ev.toDF().toDF("txid", "ts"),
      cm.toDF().toDF("txid", "commit_ts"),
      maxDelay = "10 minutes", delayThreshold = "5 minutes")
    val q = joined.writeStream.format("memory")
      .queryName("ss_join").outputMode("append").start()
    try {
      // batch 1: event for tx 1 at t=100, no commit yet
      ev.addData((1L, ts(100)))
      q.processAllAvailable()
      assert(spark.table("ss_join").count() == 0)

      // batch 2: commit for tx 1 at t=105 (inside [100, 110]) joins
      // across batches; commit for tx 2 at t=105 has no event
      cm.addData((1L, ts(105)), (2L, ts(105)))
      q.processAllAvailable()
      val afterB2 = spark.table("ss_join")
        .select($"txid").as[Long].collect().toSeq
      assert(afterB2 == Seq(1L))

      // batch 3: commit for tx 3 OUTSIDE the range bound (event at
      // t=200, commit at t=215 > 200+10) never joins
      ev.addData((3L, ts(200)))
      cm.addData((3L, ts(215)))
      q.processAllAvailable()
      assert(spark.table("ss_join").count() == 1)

      // advance both watermarks far ahead (t=1000), then deliver a
      // commit at t=203 that WOULD match tx 3's event — but is now
      // below the watermark: dropped, state already evicted
      ev.addData((99L, ts(1000)))
      cm.addData((98L, ts(1000)))
      q.processAllAvailable()
      cm.addData((3L, ts(203)))
      q.processAllAvailable()
      assert(spark.table("ss_join").count() == 1,
        "late commit below the watermark must be dropped")
    } finally q.stop()
  }
}

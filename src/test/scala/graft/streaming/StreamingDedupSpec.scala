package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/**
 * Bounded-state streaming dedup ([[Dedup.streamingDedup]]): exact
 * content dedup at ingestion time whose state is limited to the
 * watermark horizon. Proves the three properties that matter at
 * 100 TB:
 *  - duplicates are dropped ACROSS micro-batches (state, not
 *    per-batch distinct);
 *  - normalization-equal content (case/whitespace variants) shares
 *    one key;
 *  - state is EVICTED once the watermark passes (a late re-arrival of
 *    an aged-out key is re-admitted — the documented horizon
 *    trade-off, and the reason state stays bounded forever).
 */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("cross-batch drop, normalization equivalence, watermark eviction") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val deduped = Dedup.streamingDedup(docs, delay = "10 seconds")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try {
      // batch 1: A, B, and an in-batch normalization-variant of A
      input.addData(
        (1L, ts(10), "doc alpha content"),
        (2L, ts(11), "doc beta content"),
        (3L, ts(11), "  DOC   Alpha CONTENT "))
      q.processAllAvailable()
      // batch 2: exact duplicate of A within the horizon -> dropped;
      // watermark advances to 100-10=90, evicting both keys
      input.addData(
        (4L, ts(12), "doc alpha content"),
        (5L, ts(100), "doc gamma content"))
      q.processAllAvailable()
      // batch 3: A again at t=200 — its state aged out, re-admitted
      input.addData((6L, ts(200), "doc alpha content"))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream")
        .select($"doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 5L, 6L))
    } finally q.stop()
  }

  test("streaming prefix equals batch exactDedup inside one horizon") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val q = Dedup.streamingDedup(docs, delay = "1 hour")
      .writeStream.format("memory")
      .queryName("dedup_stream_eq").outputMode("append").start()
    val rows = (1L to 40L).map(i => (i, ts(i), s"content ${i % 7}"))
    try {
      rows.grouped(13).foreach { g =>
        input.addData(g: _*); q.processAllAvailable()
      }
      val streamed = spark.table("dedup_stream_eq")
        .select($"doc_id").as[Long].collect().toSet
      val batch = Dedup.exactDedup(
          rows.toDF("doc_id", "event_time", "text"))
        .select($"doc_id").as[Long].collect().toSet
      // arrival order == doc_id order, so min-id survivors coincide
      assert(streamed == batch)
      assert(streamed.size == 7)
    } finally q.stop()
  }
}

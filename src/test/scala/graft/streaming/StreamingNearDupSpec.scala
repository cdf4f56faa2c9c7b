package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/**
 * Streaming LSH near-dup screen ([[StreamingNearDup]]): the
 * ingestion-time candidate filter in front of the batch verifier.
 * Pins the four properties that matter:
 *  - stream and batch produce IDENTICAL band buckets (same h60
 *    signature path), so screen decisions transfer to the batch
 *    verifier's universe;
 *  - an exact duplicate arriving within the horizon loses every band
 *    (bands_owned = 0, is_candidate) across micro-batches, and a
 *    near-duplicate (one word changed) collides on some-but-not-all
 *    bands — flagged, never silently dropped;
 *  - distinct content owns all its bands and is admitted;
 *  - an aged-out bucket re-admits a late duplicate (bounded state, the
 *    documented horizon trade-off) — including when the re-arrival
 *    lands in the same micro-batch that would have fired the timeout.
 */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private val alpha = "the quick brown fox jumps over the lazy dog " +
    "while the autumn rain falls softly on the quiet village roofs"
  private val beta = "completely different content about spark " +
    "structured streaming state stores and watermark semantics today"
  private val alphaNear = alpha.replace("autumn", "winter")
  private val gamma = "a third unrelated document mentioning parquet " +
    "row groups column chunks and dictionary encoded page headers"

  test("stream band rows bucket identically to the batch LSH path") {
    val docs = Seq((1L, ts(10), alpha), (2L, ts(11), beta))
      .toDF("doc_id", "event_time", "text")
    val stream = StreamingNearDup.bandRows(docs)
      .select($"doc_id", $"band", $"bucket")
      .as[(Long, Int, Long)].collect().toSet
    val batch = Dedup.lshBuckets(docs)
      .as[(Long, Int, Long)].collect().toSet
    assert(stream == batch && stream.size == 16)
  }

  test("exact dup flagged all-bands, near-dup some-bands, distinct admitted") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val got = mutable.Map[Long, (Long, Long, Boolean)]()
    val q = StreamingNearDup.ownership(docs, delay = "10 seconds",
        horizonMs = 10000L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        StreamingNearDup.verdicts(b.toDF())
          .as[(Long, Long, Long, Boolean)].collect()
          .foreach(r => got.synchronized { got(r._1) = (r._2, r._3, r._4) })
        ()
      }.start()
    try {
      input.addData((1L, ts(10), alpha), (2L, ts(11), beta))
      q.processAllAvailable()
      input.addData((3L, ts(12), alpha), // exact dup of 1
        (4L, ts(13), alphaNear),         // near dup of 1
        (5L, ts(14), gamma))             // distinct
      q.processAllAvailable()
      val bands = got(1L)._1
      assert(got(1L) == ((bands, bands, false))) // first owns everything
      assert(got(2L) == ((bands, bands, false)))
      assert(got(3L) == ((bands, 0L, true)),
        s"exact dup must lose every band: ${got(3L)}")
      val (nb4, own4, cand4) = got(4L)
      assert(cand4 && own4 > 0L && own4 < nb4,
        s"near dup should collide on some-but-not-all bands: ${got(4L)}")
      assert(got(5L) == ((bands, bands, false)))
    } finally q.stop()
  }

  test("randomized batching: stream ownership == batch first-owner fold") {
    // 30 docs (dups, near-dups, distinct) pushed through RANDOM batch
    // splits with a horizon longer than the stream: ownership must
    // equal the batch-side fold (first arrival per (band,bucket) in
    // (ts, doc_id) order owns it), independent of micro-batch
    // alignment. Seeded loop, 3 rounds.
    val pool = Vector(alpha, beta, gamma, alphaNear,
      alpha.replace("quick", "swift"), beta.replace("today", "tomorrow"))
    val rnd = new scala.util.Random(77)
    for (round <- 1 to 3) {
      val docs = (1L to 30L).map(i =>
        (i, ts(i), pool(rnd.nextInt(pool.size))))
      val batchBuckets = Dedup.lshBuckets(
          docs.toDF("doc_id", "event_time", "text"))
        .as[(Long, Int, Long)].collect()
      // reference fold: arrival order == (ts, doc_id) == doc_id order
      val owner = scala.collection.mutable.Map[(Int, Long), Long]()
      val expOwned = scala.collection.mutable.Map[Long, Long]()
      batchBuckets.sortBy(_._1).foreach { case (id, band, bucket) =>
        val first = !owner.contains((band, bucket))
        if (first) owner((band, bucket)) = id
        expOwned(id) = expOwned.getOrElse(id, 0L) + (if (first) 1L else 0L)
      }
      val input = MemoryStream[(Long, Timestamp, String)](spark)
      val got = mutable.Map[Long, (Long, Long, Boolean)]()
      val q = StreamingNearDup.ownership(
          input.toDF().toDF("doc_id", "event_time", "text"),
          delay = "1 hour", horizonMs = 3600000L)
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
          StreamingNearDup.verdicts(b.toDF())
            .as[(Long, Long, Long, Boolean)].collect()
            .foreach(r => got.synchronized { got(r._1) = (r._2, r._3, r._4) })
          ()
        }.start()
      try {
        var rest = docs
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(7)
          input.addData(rest.take(n): _*); q.processAllAvailable()
          rest = rest.drop(n)
        }
        docs.foreach { case (id, _, _) =>
          val (nb, own, cand) = got(id)
          assert(own == expOwned(id),
            s"round $round doc $id: owned $own != expected ${expOwned(id)}")
          assert(cand == (own < nb))
        }
      } finally q.stop()
    }
  }

  test("in-batch horizon gap re-owns: verdict independent of batch split (r8 advisory)") {
    // two copies of alpha 190 s apart (horizon 10 s) arriving in ONE
    // micro-batch: the second must re-own every band — exactly what two
    // batches with the timeout firing between them would produce. Before
    // the in-batch gap walk, the second copy was flagged is_candidate
    // purely because the rows shared a batch.
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val got = mutable.Map[Long, (Long, Long, Boolean)]()
    val q = StreamingNearDup.ownership(docs, delay = "10 seconds",
        horizonMs = 10000L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        StreamingNearDup.verdicts(b.toDF())
          .as[(Long, Long, Long, Boolean)].collect()
          .foreach(r => got.synchronized { got(r._1) = (r._2, r._3, r._4) })
        ()
      }.start()
    try {
      input.addData((1L, ts(10), alpha), (2L, ts(200), alpha),
        (3L, ts(205), alpha)) // within 2's horizon: still a candidate
      q.processAllAvailable()
      assert(got(1L)._2 == got(1L)._1 && !got(1L)._3)
      assert(got(2L)._2 == got(2L)._1 && !got(2L)._3,
        s"gap past the horizon must re-own in-batch: ${got(2L)}")
      assert(got(3L) == ((got(3L)._1, 0L, true)),
        s"dup within the horizon stays flagged: ${got(3L)}")
    } finally q.stop()
  }

  test("aged-out bucket re-admits a late duplicate, even same-batch as its timeout") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val got = mutable.Map[Long, (Long, Long, Boolean)]()
    val q = StreamingNearDup.ownership(docs, delay = "10 seconds",
        horizonMs = 10000L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        StreamingNearDup.verdicts(b.toDF())
          .as[(Long, Long, Long, Boolean)].collect()
          .foreach(r => got.synchronized { got(r._1) = (r._2, r._3, r._4) })
        ()
      }.start()
    try {
      input.addData((1L, ts(10), alpha))
      q.processAllAvailable()
      // advance the watermark far past alpha's horizon (wm -> 190)
      input.addData((2L, ts(200), beta))
      q.processAllAvailable()
      // the dup arrives in the SAME batch whose timeout would evict the
      // stale buckets — the staleness re-check must re-own, not carry
      input.addData((3L, ts(210), alpha))
      q.processAllAvailable()
      assert(!got(3L)._3 && got(3L)._2 == got(3L)._1,
        s"aged-out dup must be re-admitted: ${got(3L)}")
    } finally q.stop()
  }
}

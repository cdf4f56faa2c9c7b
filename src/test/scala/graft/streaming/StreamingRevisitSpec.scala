package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/**
 * Streaming revisit classification ([[StreamingRevisit]]) — the live
 * twin of `Robots.revisitClassify`. Pins:
 *  - the verdict lattice matches the batch operator row for row
 *    (new / unchanged_304 / unchanged_digest / changed / error);
 *  - 304 and digest-identical 200 refresh the sighting WITHOUT
 *    rewriting the stored digest; changed 200 rewrites it;
 *  - errors never corrupt state (the next 200 classifies against the
 *    last good digest);
 *  - cross-batch splits don't change verdicts (state carries);
 *  - the horizon IS the retention contract: a fetch past it is `new`.
 */
class StreamingRevisitSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def run(horizonMs: Long,
                  batches: Seq[Seq[(Long, Timestamp, String, Int, String)]])
      : Seq[(Long, String, Boolean)] = {
    val input = MemoryStream[(Long, Timestamp, String, Int, String)](spark)
    val rows = mutable.Buffer[(Long, String, Boolean)]()
    val q = StreamingRevisit.classify(
        input.toDF().toDF("doc_id", "event_time", "url", "status",
          "digest"),
        delay = "1 second", horizonMs = horizonMs)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("revisit-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        rows ++= b.toDF().select("docId", "verdict", "is_revisit")
          .as[(Long, String, Boolean)](
            org.apache.spark.sql.Encoders.product[(Long, String, Boolean)])
          .collect()
        ()
      }.start()
    try {
      batches.foreach { rs => input.addData(rs: _*); q.processAllAvailable() }
    } finally q.stop()
    rows.toSeq.sortBy(_._1)
  }

  test("verdict lattice matches the batch operator across micro-batches") {
    val u = "https://a.com/p"
    val got = run(3600000L, Seq(
      Seq((1L, ts(10), u, 200, "d1")),            // first capture
      Seq((2L, ts(20), u, 304, "")),              // validated
      Seq((3L, ts(30), u, 200, "d1")),            // identical payload
      Seq((4L, ts(40), u, 200, "d2")),            // changed
      Seq((5L, ts(50), u, 200, "d2"),             // unchanged vs NEW digest
        (6L, ts(55), u, 503, "x")),               // error, state untouched
      Seq((7L, ts(60), u, 200, "d2")),            // still unchanged
      Seq((8L, ts(70), "https://b.com/q", 304, "")))) // no validators
    assert(got == Seq(
      (1L, "new", false),
      (2L, "unchanged_304", true),
      (3L, "unchanged_digest", true),
      (4L, "changed", false),
      (5L, "unchanged_digest", true),
      (6L, "error", false),
      (7L, "unchanged_digest", true),
      (8L, "error", false)))
  }

  test("in-batch splits and the horizon retention contract") {
    val u = "https://a.com/p"
    // same events in ONE batch: verdicts identical to the split run
    val oneBatch = run(3600000L, Seq(Seq(
      (1L, ts(10), u, 200, "d1"), (2L, ts(20), u, 304, ""),
      (3L, ts(30), u, 200, "d1"), (4L, ts(40), u, 200, "d2"))))
    assert(oneBatch.map(_._2) ==
      Seq("new", "unchanged_304", "unchanged_digest", "changed"))
    // horizon 15 s: the t=40 fetch is 20 s past the last sighting —
    // state aged out, the identical digest still classifies `new`
    val lapsed = run(15000L, Seq(
      Seq((1L, ts(10), u, 200, "d1"), (2L, ts(20), u, 200, "d1")),
      Seq((3L, ts(40), u, 200, "d1"))))
    assert(lapsed.map(_._2) == Seq("new", "unchanged_digest", "new"))
  }
}

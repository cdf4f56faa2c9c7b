package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/**
 * Streaming URL first-seen screen ([[StreamingUrlSeen]]) — the crawl
 * frontier's dedup. Pins:
 *  - variants that CANONICALIZE together (case, default port, tracking
 *    params, fragments, param order) share one key: first arrival
 *    `first=true`, later arrivals suppressed — across micro-batches;
 *  - distinct canonical URLs never interfere;
 *  - in-batch determinism: the (ts, doc_id) order decides the owner
 *    when variants share a micro-batch;
 *  - the horizon IS the re-crawl interval: a revisit whose gap exceeds
 *    it re-admits (in-batch gap walk, no timeout alignment needed);
 *  - stream and batch keys are the same `urlCanonical` path.
 */
class StreamingUrlSeenSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def runScreen(horizonMs: Long,
                        batches: Seq[Seq[(Long, Timestamp, String)]])
      : Seq[(Long, String, Boolean)] = {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val rows = mutable.Buffer[(Long, String, Boolean)]()
    val q = StreamingUrlSeen.firstSeen(
        input.toDF().toDF("doc_id", "event_time", "url"),
        delay = "1 second", horizonMs = horizonMs)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("urlseen-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        rows ++= b.toDF().select("docId", "canon", "first")
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

  test("canonical variants collapse to one first across micro-batches") {
    val got = runScreen(3600000L, Seq(
      Seq((1L, ts(10), "HTTP://WWW.Site.COM:80/a/b/?utm_source=x&k=1#f"),
        (2L, ts(10), "https://other.com/c")),
      Seq((3L, ts(11), "http://www.site.com/a/b?k=1&fbclid=zz"),
        (4L, ts(11), "https://other.com/c?gclid=1")),
      Seq((5L, ts(12), "http://www.site.com/a/b?k=1"))))
    val expect = Seq(
      (1L, "http://www.site.com/a/b?k=1", true),
      (2L, "https://other.com/c", true),
      (3L, "http://www.site.com/a/b?k=1", false),
      (4L, "https://other.com/c", false),
      (5L, "http://www.site.com/a/b?k=1", false))
    assert(got == expect, got.mkString("\n"))
  }

  test("in-batch determinism: earliest (ts, doc_id) owns; distinct keys independent") {
    val got = runScreen(3600000L, Seq(Seq(
      (7L, ts(10), "http://a.com/x"),   // same key, same ts: doc 5 wins
      (5L, ts(10), "http://A.com/x/"),
      (6L, ts(9), "http://a.com/x?utm_source=z"), // earlier ts: owner
      (8L, ts(10), "http://b.com/y"))))
    val expect = Seq(
      (5L, "http://a.com/x", false),
      (6L, "http://a.com/x", true),
      (7L, "http://a.com/x", false),
      (8L, "http://b.com/y", true))
    assert(got == expect, got.mkString("\n"))
  }

  test("horizon lapse re-admits: the marker TTL is the re-crawl interval") {
    val got = runScreen(5000L, Seq(
      Seq((1L, ts(10), "http://site.com/page")),
      Seq((2L, ts(12), "http://site.com/page")),   // 2 s gap: suppressed
      Seq((3L, ts(30), "http://SITE.com/page")),   // 18 s > 5 s: re-admit
      Seq((4L, ts(31), "http://site.com/page"))))  // 1 s gap: suppressed
    val expect = Seq(
      (1L, "http://site.com/page", true),
      (2L, "http://site.com/page", false),
      (3L, "http://site.com/page", true),
      (4L, "http://site.com/page", false))
    assert(got == expect, got.mkString("\n"))
  }
}

package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Robots

/**
 * The crawl frontier with POLITENESS (r11 verdict item 3 wiring): a
 * live URL stream passes [[Robots.robotsAllowed]] — a stream-static
 * host join plus narrow array expressions, no aggregation, so it
 * composes inside the streaming plan — and only admitted URLs reach
 * the [[StreamingUrlSeen]] first-seen screen. Pins that (a) a
 * disallowed URL NEVER enters frontier state (politeness runs before
 * dedup, so a blocked URL can't claim a canonical key), and (b) the
 * screen's first/suppressed semantics are unchanged downstream of
 * the join.
 */
class RobotsFrontierSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private val robotsTxt =
    "User-agent: *\nDisallow: /private/\n" +
    "User-agent: graftbot\nDisallow: /tmp/*\nAllow: /tmp/ok$\n"

  test("politeness screens the frontier: blocked URLs never reach seen-state") {
    val idx = Robots.robotsHostIndex(
      Robots.robotsRules(Seq(("site.com", robotsTxt))
        .toDF("host", "robots_txt")),
      "graftbot")
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val admitted = Robots.robotsAllowed(
      input.toDF().toDF("doc_id", "event_time", "url"), idx)
      .filter(col("allowed"))
    val rows = mutable.Buffer[(Long, String, Boolean)]()
    val q = StreamingUrlSeen.firstSeen(admitted,
        delay = "1 second", horizonMs = 3600000L)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("robots-frontier-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        rows ++= b.toDF().select("docId", "canon", "first")
          .as[(Long, String, Boolean)](
            org.apache.spark.sql.Encoders.product[(Long, String, Boolean)])
          .collect()
        ()
      }.start()
    try {
      // batch 1: /tmp/a blocked by graftbot's group; /page allowed;
      // /private/x ALLOWED for graftbot (the exact group REPLACES the
      // star group — RFC 9309 selection, not a union); /tmp/ok
      // allowed by the $-anchored rule over the /tmp/* disallow
      input.addData(
        (1L, ts(10), "https://site.com/tmp/a"),
        (2L, ts(10), "https://SITE.com/page?utm_source=x"),
        (3L, ts(10), "https://site.com/private/x"),
        (4L, ts(10), "https://site.com/tmp/ok"))
      q.processAllAvailable()
      // batch 2: canonical dup of the admitted /page (suppressed, not
      // first) and a retry of the blocked /tmp/a variant — STILL
      // blocked, and because politeness ran first, the earlier block
      // left no state: /tmp/a never owned its canonical key
      input.addData(
        (5L, ts(11), "https://site.com/page"),
        (6L, ts(11), "https://site.com/tmp/a?utm_source=y"))
      q.processAllAvailable()
    } finally q.stop()
    val got = rows.toSeq.sortBy(_._1)
    // doc 1 and 6 (disallowed /tmp/a) never appear; 3 allowed (exact
    // group wins over star); 4 allowed by the $ anchor; 5 suppressed
    // as a canonical dup of 2
    assert(got.map(_._1) == Seq(2L, 3L, 4L, 5L))
    assert(got.collect { case (id, _, first) if first => id } ==
      Seq(2L, 3L, 4L))
    val canon2 = got.find(_._1 == 2L).get._2
    assert(got.find(_._1 == 5L).get._2 == canon2)
  }

  test("batch and stream admit identically (one decision code path)") {
    val idx = Robots.robotsHostIndex(
      Robots.robotsRules(Seq(("site.com", robotsTxt))
        .toDF("host", "robots_txt")),
      "graftbot")
    val urls = Seq(
      (1L, "https://site.com/tmp/a"), (2L, "https://site.com/page"),
      (3L, "https://site.com/private/x"), (4L, "https://site.com/tmp/ok"))
      .toDF("doc_id", "url")
    val batchVerdicts = Robots.robotsAllowed(urls, idx)
      .select($"doc_id", $"allowed").as[(Long, Boolean)]
      .collect().toMap
    assert(batchVerdicts == Map(1L -> false, 2L -> true,
      3L -> true, 4L -> true))
  }

  test("sitemapParse runs inside a streaming plan (stateless narrow map)") {
    // a fetch wave returns a MIX of index and urlset documents on a
    // live stream; the unified parse branches per document with no
    // state and no aggregation — frontier recursion stays a
    // stream-side map plus a (batch) join against the fetched store
    val input = MemoryStream[(Long, String)](spark)
    val rows = mutable.Buffer[(Long, String, String, Boolean)]()
    val q = Robots.sitemapParse(input.toDF().toDF("doc_id", "xml"))
      .select($"doc_id", $"kind", $"loc", $"is_seed")
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("smparse-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        rows ++= b.toDF().as[(Long, String, String, Boolean)].collect()
        ()
      }.start()
    try {
      input.addData(
        (1L, "<sitemapindex><sitemap><loc>https://a.com/sm/1.xml</loc>" +
          "</sitemap></sitemapindex>"),
        (2L, "<urlset><url><loc>https://a.com/p1</loc></url></urlset>"),
        (3L, "<html>junk</html>"))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows.sortBy(_._1).toSeq == Seq(
      (1L, "index", "https://a.com/sm/1.xml", false),
      (2L, "urlset", "https://a.com/p1", true)))
  }
}

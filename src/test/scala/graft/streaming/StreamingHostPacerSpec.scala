package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Robots

/** [[StreamingHostPacer]] — crawl-delay as a minimum event-time gap
  * between admitted fetches per host, composed with the robots admit
  * filter in one query. */
class StreamingHostPacerSpec extends SparkSpec {
  import spark.implicits._

  // offset base: an event at literal epoch 0 collides with the
  // stream's initial watermark and is dropped as late
  private def ts(ms: Long): Timestamp = new Timestamp(1000000L + ms)

  private val robotsTxt =
    "User-agent: *\nCrawl-delay: 2\nDisallow: /private/\n"

  private def mkIdx(txt: String) = Robots.robotsHostIndex(
    Robots.robotsRules(Seq(("slow.com", txt))
      .toDF("host", "robots_txt")),
    "graftbot")

  private def idx = mkIdx(robotsTxt)

  private def run(batches: Seq[Seq[(Long, Timestamp, String)]],
                  politeFirst: Boolean = false,
                  horizonMs: Long = 3600000L,
                  txt: String = robotsTxt)
      : Seq[(Long, Boolean, Long)] = {
    val hostIdx = mkIdx(txt)
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val urls = input.toDF().toDF("doc_id", "event_time", "url")
    val src = if (politeFirst)
      Robots.robotsAllowed(urls, hostIdx).filter(col("allowed"))
        .select(col("doc_id"), col("event_time"), col("url"))
    else urls
    val rows = mutable.Buffer[(Long, Boolean, Long)]()
    val q = StreamingHostPacer.paced(src, hostIdx,
        delay = "1 second", horizonMs = horizonMs)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("pacer-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        rows ++= b.toDF().select("docId", "admit", "wait_ms")
          .as[(Long, Boolean, Long)](
            org.apache.spark.sql.Encoders.product[(Long, Boolean, Long)])
          .collect()
        ()
      }.start()
    try {
      batches.foreach { rs => input.addData(rs: _*); q.processAllAvailable() }
    } finally q.stop()
    rows.toSeq.sortBy(_._1)
  }

  test("crawl-delay is a minimum event-time gap; deferrals carry their wait") {
    // delay 2 s; arrivals at 0, 1, 2, 3, 4.5 s
    val got = run(Seq(Seq(
      (1L, ts(0), "https://slow.com/a"),
      (2L, ts(1000), "https://slow.com/b"),
      (3L, ts(2000), "https://slow.com/c"),
      (4L, ts(3000), "https://slow.com/d"),
      (5L, ts(4500), "https://slow.com/e"))))
    // admit 0s; 1s deferred (1000 ms left); admit 2s; 3s deferred;
    // 4.5s admitted (gap 2.5s from the 2s admit)
    assert(got == Seq((1L, true, 0L), (2L, false, 1000L),
      (3L, true, 0L), (4L, false, 1000L), (5L, true, 0L)))
  }

  test("verdicts independent of the batch split; unknown hosts admit freely") {
    def ev(i: Long, ms: Long) = (i, ts(ms), "https://slow.com/p" + i)
    val one = run(Seq(Seq(ev(1, 0), ev(2, 1000), ev(3, 2000))))
    val split = run(Seq(Seq(ev(1, 0)), Seq(ev(2, 1000)), Seq(ev(3, 2000))))
    assert(one == split)
    val free = run(Seq(Seq(
      (1L, ts(0), "https://nodelay.example/a"),
      (2L, ts(1), "https://nodelay.example/b"))))
    assert(free.forall(r => r._2 && r._3 == 0L))
  }

  test("hosts pace independently; deferrals do not advance the mark") {
    val got = run(Seq(Seq(
      (1L, ts(0), "https://slow.com/a"),
      (2L, ts(0), "https://other.example/x"),
      (3L, ts(1000), "https://slow.com/b"), // deferred
      (4L, ts(1999), "https://slow.com/c"), // still vs t=0 mark
      (5L, ts(2000), "https://slow.com/d")))) // admits exactly at gap
    assert(got.map(r => (r._1, r._2)) == Seq((1L, true), (2L, true),
      (3L, false), (4L, false), (5L, true)))
    assert(got.find(_._1 == 4L).get._3 == 1L) // 2000 - 1999
  }

  test("composes with the robots admit filter in one query (disallowed never pace)") {
    val got = run(Seq(Seq(
      (1L, ts(0), "https://slow.com/private/x"), // blocked by robots
      (2L, ts(0), "https://slow.com/ok"),
      (3L, ts(1000), "https://slow.com/ok2"))), politeFirst = true)
    // doc 1 never reaches the pacer; doc 2 admits and holds the mark
    // doc 1's fetch would otherwise have consumed
    assert(got.map(_._1) == Seq(2L, 3L))
    assert(got == Seq((2L, true, 0L), (3L, false, 1000L)))
  }

  test("a fetchSchedule plan admits clean through the pacer (loop closed)") {
    // the recrawl schedule's fetch_offset_sec respects the host gap by
    // construction — replaying it as event-time through the pacer must
    // admit EVERY row (discovery → schedule → pace, end to end)
    val seeds = Seq(
      ("https://slow.com/a", "2026-01-01"),
      ("https://slow.com/b", ""),
      ("https://slow.com/c", "2026-02-01"),
      ("https://slow.com/d", "2026-01-15")).toDF("loc", "lastmod")
    val plan = Robots.fetchSchedule(seeds, idx, budgetPerCycle = 2)
      .select(col("loc"), col("fetch_offset_sec"), col("rank"), col("cycle"))
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._3)
    // freshest lastmod first, absent last; delay 2 s per fetch
    assert(plan.map(_._1) == Seq("https://slow.com/c",
      "https://slow.com/d", "https://slow.com/a", "https://slow.com/b"))
    assert(plan.map(_._2) == Seq(0L, 2L, 4L, 6L))
    assert(plan.map(_._4) == Seq(0L, 0L, 1L, 1L))
    val got = run(Seq(plan.map(p => (p._3, ts(p._2 * 1000L), p._1))))
    assert(got.forall(_._2), s"scheduled fetch deferred by the pacer: $got")
  }

  test("retryPolicy output re-enters pacing: backoff and crawl-delay both hold") {
    // a 503 retry on slow.com (delay 2 s): retryPolicy says wait
    // next_fetch_sec (backoff 10 s at attempt 0); replaying the fetch
    // at original_ts + backoff through the pacer must ADMIT (10 s >
    // 2 s gap), while an impatient client retrying after only 1 s is
    // deferred by the politeness gap even though ITS backoff said go
    val policy = Robots.retryPolicy(Seq(
        (1L, 503, 0L, null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "status", "attempt", "retry_after"))
      .select(col("next_fetch_sec")).as[Long].head()
    assert(policy == 10L)
    val got = run(Seq(Seq(
      (1L, ts(0), "https://slow.com/a"),                 // first fetch
      (2L, ts(1000), "https://slow.com/a"),              // impatient retry
      (3L, ts(policy * 1000L), "https://slow.com/a"))))  // policy retry
    assert(got.find(_._1 == 1L).get._2)
    assert(!got.find(_._1 == 2L).get._2,
      "politeness must still defer a too-early retry")
    assert(got.find(_._1 == 3L).get._2,
      "the backoff-scheduled retry must admit")
  }

  test("crawl-delay larger than the horizon still enforces the full gap") {
    // r12 ADVICE: delay 120 s vs horizon 60 s — the last-admit mark
    // must NOT be evicted mid-gap (the effective horizon clamps to the
    // host's own delay). Batch 2's other-host event pushes the
    // watermark to ~79 s, past the raw horizon of the t=0 admit; the
    // t=90 s fetch of slow.com is still 30 s inside the politeness gap
    // and must defer, not slip through an evicted state.
    val delayedTxt = "User-agent: *\nCrawl-delay: 120\n"
    val got = run(Seq(
        Seq((1L, ts(0), "https://slow.com/a")),
        Seq((2L, ts(80000), "https://other.example/x")),
        Seq((3L, ts(90000), "https://slow.com/b")),
        Seq((4L, ts(121000), "https://slow.com/c"))),
      horizonMs = 60000L, txt = delayedTxt)
    assert(got.find(_._1 == 1L).get == ((1L, true, 0L)))
    assert(got.find(_._1 == 3L).get == ((3L, false, 30000L)),
      s"mid-gap fetch slipped through an evicted mark: $got")
    assert(got.find(_._1 == 4L).get == ((4L, true, 0L))) // gap lapsed
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Robots]] — robots.txt parsing (RFC 9309 group/agent semantics)
  * and the longest-match path-rule decision. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val txt =
    """# demo robots
      |User-Agent: *
      |Disallow: /private/
      |Allow: /private/pub/
      |Crawl-delay: 2
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /tmp/*
      |Allow: /tmp/ok$
      |Sitemap: https://a.com/map.xml
      |""".stripMargin

  private def rules(host: String = "a.com", t: String = txt) =
    Robots.robotsRules(Seq((host, t)).toDF("host", "robots_txt"))

  test("robotsRules: groups, comments, unknown fields, multi-UA accumulation") {
    val got = rules().orderBy($"agent", $"rule_ord")
      .as[(String, Long, String, String, String, Long)].collect().toSeq
    // group 1 = *, group 2 = {graftbot, otherbot}; Sitemap dropped;
    // field names case-insensitive; agent values lowercased
    assert(got.map(_._3).distinct.sorted == Seq("*", "graftbot", "otherbot"))
    val star = got.filter(_._3 == "*").map(r => (r._4, r._5))
    assert(star == Seq(("disallow", "/private/"), ("allow", "/private/pub/"),
      ("crawl-delay", "2")))
    val gb = got.filter(_._3 == "graftbot").map(r => (r._4, r._5))
    assert(gb == Seq(("disallow", "/tmp/*"), ("allow", "/tmp/ok$")))
    // both agents of the second group carry identical rules
    assert(got.filter(_._3 == "otherbot").map(r => (r._4, r._5)) == gb)
  }

  test("robotsSitemaps: group-independent, any position, comments stripped") {
    val t = "Sitemap: https://a.com/top.xml # seed\n" +
      "User-agent: *\nDisallow: /x\n" +
      "Sitemap: https://a.com/mid.xml\nSitemap:\n"
    val got = Robots.robotsSitemaps(
        Seq(("a.com", t)).toDF("host", "robots_txt"))
      .orderBy($"ln").select($"sitemap_url").as[String].collect().toSeq
    // both positions survive (before and inside a group), the comment
    // strips, the empty value drops — and the RULES table is
    // unaffected by the interleaved sitemap lines
    assert(got == Seq("https://a.com/top.xml", "https://a.com/mid.xml"))
    val rules = Robots.robotsRules(Seq(("a.com", t)).toDF("host", "robots_txt"))
      .select($"directive", $"value").as[(String, String)].collect().toSeq
    assert(rules == Seq(("disallow", "/x")))
  }

  test("sitemapEntries: blocks in order, loc trimmed + decoded, lastmod optional") {
    val xml = "<?xml version=\"1.0\"?>\n" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      "<url><loc> https://a.com/p?x=1&amp;y=2 </loc>" +
      "<lastmod>2026-01-01</lastmod></url>\n" +
      "<url>\n  <loc>https://a.com/q</loc>\n</url>\n</urlset>"
    val got = Robots.sitemapEntries(Seq((7L, xml)).toDF("doc_id", "xml"))
      .orderBy($"pos").select($"pos", $"loc", $"lastmod")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((0L, "https://a.com/p?x=1&y=2", "2026-01-01"),
      (1L, "https://a.com/q", "")))
    // index files (<sitemap> blocks) and null xml yield no entries
    val idx = "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>" +
      "</sitemap></sitemapindex>"
    assert(Robots.sitemapEntries(
      Seq((1L, idx), (2L, null: String)).toDF("doc_id", "xml")).count() == 0L)
  }

  test("sitemapIndexEntries: pointers in order, nested entity decode, lastmod optional") {
    val xml = "<?xml version=\"1.0\"?>\n" +
      "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      "<sitemap>\n  <loc> https://a.com/sm/part1.xml?a=1&amp;b=&lt;2&gt; </loc>\n" +
      "  <lastmod>2026-02-02</lastmod>\n</sitemap>\n" +
      "<sitemap><loc>https://a.com/sm/part2.xml</loc></sitemap>\n" +
      "</sitemapindex>"
    val got = Robots.sitemapIndexEntries(Seq((3L, xml)).toDF("doc_id", "xml"))
      .orderBy($"pos").select($"pos", $"child_url", $"lastmod")
      .as[(Long, String, String)].collect().toSeq
    // &amp; decoded LAST: &lt;/&gt; resolve first, no double-decode
    assert(got == Seq((0L, "https://a.com/sm/part1.xml?a=1&b=<2>", "2026-02-02"),
      (1L, "https://a.com/sm/part2.xml", "")))
    // urlset documents and null xml yield no pointer rows
    val leaf = "<urlset><url><loc>https://a.com/p</loc></url></urlset>"
    assert(Robots.sitemapIndexEntries(
      Seq((1L, leaf), (2L, null: String)).toDF("doc_id", "xml")).count() == 0L)
  }

  test("sitemapKind + sitemapParse: mixed store branches per document") {
    val idx = "<?xml version=\"1.0\"?><sitemapindex>\n" +
      "<sitemap><loc>https://a.com/sm/1.xml</loc></sitemap>\n" +
      "<sitemap><loc>https://a.com/sm/2.xml</loc></sitemap></sitemapindex>"
    val leaf = "<urlset>\n<url><loc>https://a.com/p1</loc>" +
      "<lastmod>2026-03-03</lastmod></url></urlset>"
    val junk = "<html><body>not a sitemap</body></html>"
    val store = Seq((1L, idx), (2L, leaf), (3L, junk), (4L, null: String))
      .toDF("doc_id", "xml")
    val kinds = store.select($"doc_id", Robots.sitemapKind($"xml"))
      .as[(Long, String)].collect().toMap
    assert(kinds == Map(1L -> "index", 2L -> "urlset", 3L -> "unknown",
      4L -> "unknown"))
    val parsed = Robots.sitemapParse(store)
      .select($"doc_id", $"kind", $"pos", $"loc", $"is_seed", $"lastmod")
      .as[(Long, String, Long, String, Boolean, String)]
      .collect().toSeq.sortBy(r => (r._1, r._3))
    assert(parsed == Seq(
      (1L, "index", 0L, "https://a.com/sm/1.xml", false, ""),
      (1L, "index", 1L, "https://a.com/sm/2.xml", false, ""),
      (2L, "urlset", 0L, "https://a.com/p1", true, "2026-03-03")))
    // unknown docs yield ZERO rows (flag-don't-fail: the caller's
    // anti-join against its input store finds them)
    assert(!parsed.exists(r => r._1 == 3L || r._1 == 4L))
  }

  test("fetchSchedule: freshest-first rank, budget cycles, gap floor") {
    // agent "newsbot" has no exact group in the fixture → star group
    // → a.com carries Crawl-delay 2; b.com is absent from the index
    // → gap floors at minGapSec=1
    val seeds = Seq(
      ("https://a.com/x", ""), ("https://a.com/y", "2026-01-02"),
      ("https://a.com/z", "2026-01-02"), ("https://b.com/only", ""))
      .toDF("loc", "lastmod")
    val idx = Robots.robotsHostIndex(rules(), "newsbot")
    val got = Robots.fetchSchedule(seeds, idx, budgetPerCycle = 2)
      .select($"host", $"loc", $"rank", $"cycle", $"gap_sec",
        $"fetch_offset_sec")
      .as[(String, String, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._3))
    // a.com: lastmod DESC (absent last), url ASC tiebreak; one fetch
    // per 2 s; budget 2 → third URL lands in cycle 1
    assert(got == Seq(
      ("a.com", "https://a.com/y", 0L, 0L, 2L, 0L),
      ("a.com", "https://a.com/z", 1L, 0L, 2L, 2L),
      ("a.com", "https://a.com/x", 2L, 1L, 2L, 4L),
      ("b.com", "https://b.com/only", 0L, 0L, 1L, 0L)))
  }

  test("fetchSchedule: mixed W3C lastmod forms rank by INSTANT, not string") {
    // r13 ADVICE: '2026-01-02T06:00:00+12:00' is 2026-01-01T18:00 UTC
    // — OLDER than plain '2026-01-02' despite sorting lexicographically
    // after it; an unparseable value ranks last, with the absent ones
    val seeds = Seq(
      ("https://a.com/offset", "2026-01-02T06:00:00+12:00"),
      ("https://a.com/plain", "2026-01-02"),
      ("https://a.com/junk", "not-a-date"),
      ("https://a.com/full", "2026-01-02T12:00:00Z"))
      .toDF("loc", "lastmod")
    val idx = Robots.robotsHostIndex(rules(), "newsbot")
    val got = Robots.fetchSchedule(seeds, idx)
      .orderBy($"rank").select($"loc").as[String].collect().toSeq
    assert(got == Seq("https://a.com/full", "https://a.com/plain",
      "https://a.com/offset", "https://a.com/junk"))
  }

  test("resolveRedirects: ok / loop / dangling / too_many, bounded hops") {
    val f = Seq(
      ("a", 301, "b"), ("b", 302, "c"), ("c", 200, null),
      ("x", 301, "y"), ("y", 301, "x"), // A -> B -> A
      ("d", 301, "ghost"),              // target never fetched
      ("t0", 301, "t1"), ("t1", 301, "t2"), ("t2", 301, "t3"),
      ("t3", 301, "t4"), ("t4", 200, null))
      .toDF("url", "status", "location")
    val got = Robots.resolveRedirects(f, maxHops = 3)
      .select($"url", $"final_url", $"n_hops", $"final_status", $"outcome")
      .as[(String, String, Long, Option[Int], String)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got("a") == (("c", 2L, Some(200), "ok")))
    assert(got("b") == (("c", 1L, Some(200), "ok")))
    assert(got("c") == (("c", 0L, Some(200), "ok")))
    // the loop flags when the chain REVISITS a node; the status kept
    // is the last redirecting node's
    assert(got("x") == (("x", 2L, Some(301), "loop")))
    assert(got("y") == (("y", 2L, Some(301), "loop")))
    assert(got("d") == (("ghost", 1L, None, "dangling")))
    // hop budget: t0 is 4 redirects deep — still redirecting at 3
    assert(got("t0") == (("t3", 3L, Some(301), "too_many")))
    assert(got("t1") == (("t4", 3L, Some(200), "ok")))
    assert(got("t2") == (("t4", 2L, Some(200), "ok")))
  }

  test("resolveUrl: RFC 3986 branches and dot-segment normalization") {
    val cases = Seq(
      // absolute passes through (fragment dropped)
      ("https://a.com/u/1", "https://b.com/x#frag", "https://b.com/x"),
      // protocol-relative takes the base scheme
      ("https://a.com/u/1", "//b.com/x", "https://b.com/x"),
      // root-relative takes scheme+authority, dot segments removed
      ("https://a.com/u/1?q=2", "/a/b/../c", "https://a.com/a/c"),
      // relative merges onto the base directory (§5.2.3)
      ("https://a.com/u/1", "x/y", "https://a.com/u/x/y"),
      // ../ pins: pops never pass the root; trailing ../ keeps slash
      ("https://a.com/u/v/1", "../2?k=1", "https://a.com/u/2?k=1"),
      ("https://a.com/u/1", "../../../x", "https://a.com/x"),
      ("https://a.com/u/v/w", "..", "https://a.com/u/"),
      ("https://a.com/u/1", "./x/./y", "https://a.com/u/x/y"),
      // query-only replaces the base query
      ("https://a.com/u/1?old=1", "?new=2", "https://a.com/u/1?new=2"),
      // §5.2.3: authority + EMPTY path merges as "/" + ref — both the
      // bare-host base and the query-only base (whose path-and-query
      // starts at '?', leaving an empty path to merge onto)
      ("https://a.com", "page.html", "https://a.com/page.html"),
      ("https://a.com?q=1", "page.html", "https://a.com/page.html"),
      // empty ref is the base
      ("https://a.com/u/1", "", "https://a.com/u/1"),
      // a non-absolute base cannot anchor: ref passes through raw
      ("not-a-url", "x/y", "x/y"))
    val got = cases.zipWithIndex
      .map { case ((b, r, _), i) => (i, b, r) }
      .toDF("i", "base", "ref")
      .select($"i", Robots.resolveUrl($"base", $"ref").as("out"))
      .as[(Int, String)].collect().toMap
    for (((b, r, want), i) <- cases.zipWithIndex)
      assert(got(i) == want, s"resolve($b, $r)")
  }

  test("resolveRedirects: relative Location targets chain-join (r13 item 3)") {
    val f = Seq(
      ("https://a.com/u/1", 301, "x/../2"),        // dot-segment hop
      ("https://a.com/u/2", 302, "/u/3"),          // root-relative hop
      ("https://a.com/u/3", 301, "//b.com/t"),     // protocol-relative
      ("https://b.com/t", 200, null),
      ("https://a.com/u/9", 301, "/ghost/9"))      // unfetched target
      .toDF("url", "status", "location")
    val got = Robots.resolveRedirects(f)
      .select($"url", $"final_url", $"n_hops", $"outcome")
      .as[(String, String, Long, String)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("https://a.com/u/1") ==
      (("https://b.com/t", 3L, "ok")))
    assert(got("https://a.com/u/2") == (("https://b.com/t", 2L, "ok")))
    assert(got("https://a.com/u/9") ==
      (("https://a.com/ghost/9", 1L, "dangling")))
  }

  test("retryPolicy: Retry-After beats backoff; 429 and 5xx drop past the budget") {
    val f = Seq(
      (1L, 200, 0L, null.asInstanceOf[java.lang.Long]),
      (2L, 302, 1L, null.asInstanceOf[java.lang.Long]),
      (3L, 404, 0L, null.asInstanceOf[java.lang.Long]),
      (4L, 429, 2L, java.lang.Long.valueOf(7L)), // Retry-After wins
      (5L, 429, 2L, null.asInstanceOf[java.lang.Long]), // backoff 40
      (6L, 503, 0L, null.asInstanceOf[java.lang.Long]), // backoff 10
      (7L, 503, 6L, null.asInstanceOf[java.lang.Long]), // >= maxAttempts
      (8L, 500, 2L, null.asInstanceOf[java.lang.Long]), // backoff 40
      (9L, 503, 2L, java.lang.Long.valueOf(9L)), // Retry-After on 503 too
      // r13 verdict item 4: a 429-forever host drops at the SAME
      // budget as a 503-forever one — even with Retry-After present
      (10L, 429, 3L, null.asInstanceOf[java.lang.Long]),
      (11L, 429, 3L, java.lang.Long.valueOf(7L)))
      .toDF("doc_id", "status", "attempt", "retry_after")
    val got = Robots.retryPolicy(f)
      .select($"doc_id", $"action", $"next_fetch_sec")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> (("ok", None)), 2L -> (("redirect", None)),
      3L -> (("drop", None)), 4L -> (("retry", Some(7L))),
      5L -> (("retry", Some(40L))), 6L -> (("retry", Some(10L))),
      7L -> (("drop", None)), 8L -> (("retry", Some(40L))),
      9L -> (("retry", Some(9L))),
      10L -> (("drop", None)), 11L -> (("drop", None))))
    // the cap binds under a wider budget: attempt 8 shifts past it
    val capped = Robots.retryPolicy(
        Seq((1L, 429, 8L, null.asInstanceOf[java.lang.Long]))
          .toDF("doc_id", "status", "attempt", "retry_after"),
        maxAttempts = 10)
      .select($"next_fetch_sec").as[Long].head()
    assert(capped == 300L)
    // shift clamp (r13 ADVICE): an untrusted attempt value far past
    // any budget must never compute a negative backoff — here a
    // wide-open budget still yields the saturated cap, not 1L<<63
    val huge = Robots.retryPolicy(
        Seq((1L, 503, 61L, null.asInstanceOf[java.lang.Long]))
          .toDF("doc_id", "status", "attempt", "retry_after"),
        maxAttempts = 62)
      .select($"next_fetch_sec").as[Long].head()
    assert(huge == 300L)
    // a NULL attempt is a first attempt: 503 retries at base backoff
    // instead of silently dropping through a null comparison
    val nullAttempt = Robots.retryPolicy(
        Seq((1L, 503, null.asInstanceOf[java.lang.Long],
          null.asInstanceOf[java.lang.Long]))
          .toDF("doc_id", "status", "attempt", "retry_after"))
      .select($"action", $"next_fetch_sec")
      .as[(String, Option[Long])].head()
    assert(nullAttempt == (("retry", Some(10L))))
    // a NEGATIVE attempt (untrusted log) is also a first attempt:
    // without the floor, shiftleft(1L, -2) wraps mod 64 into 1L<<62
    // and the backoff overflows negative
    val negAttempt = Robots.retryPolicy(
        Seq((1L, 503, java.lang.Long.valueOf(-2L),
          null.asInstanceOf[java.lang.Long]))
          .toDF("doc_id", "status", "attempt", "retry_after"))
      .select($"action", $"next_fetch_sec")
      .as[(String, Option[Long])].head()
    assert(negAttempt == (("retry", Some(10L))))
  }

  test("revisitClassify: 304/digest/changed/new/error; unchanged deprioritized") {
    val stored = Seq(
      ("https://a.com/1", "d1"), ("https://a.com/2", "d2"),
      ("https://a.com/3", "d3"), ("https://a.com/4", "d4"))
      .toDF("url", "digest")
    val fetched = Seq(
      ("https://a.com/1", 304, null.asInstanceOf[String]), // validated
      ("https://a.com/2", 200, "d2"),   // identical payload → revisit
      ("https://a.com/3", 200, "d3x"),  // changed
      ("https://a.com/4", 500, "x"),    // error → retry policy's job
      ("https://a.com/9", 200, "d9"),   // never stored → new
      ("https://a.com/8", 304, null.asInstanceOf[String])) // anomaly
      .toDF("url", "status", "digest")
    val got = Robots.revisitClassify(fetched, stored)
      .select($"url", $"verdict", $"is_revisit", $"next_priority")
      .as[(String, String, Boolean, Long)].collect()
      .map(r => r._1.split('/').last -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      "1" -> (("unchanged_304", true, 0L)),
      "2" -> (("unchanged_digest", true, 0L)),
      "3" -> (("changed", false, 2L)),
      "4" -> (("error", false, 1L)),
      "9" -> (("new", false, 2L)),
      "8" -> (("error", false, 1L))))
  }

  test("conditionalFetchPlan: validators become RFC 9110 headers") {
    val stored = Seq(
      ("https://a.com/1", "\"e1\"", ""),
      ("https://a.com/2", "", "Mon, 01 Jun 2026 00:00:00 GMT"),
      ("https://a.com/3", "\"e3\"", "Tue, 02 Jun 2026 00:00:00 GMT"))
      .toDF("url", "etag", "last_modified")
    val sched = Seq("https://a.com/1", "https://a.com/2",
      "https://a.com/3", "https://a.com/9").toDF("url")
    val got = Robots.conditionalFetchPlan(sched, stored)
      .select($"url", $"if_none_match", $"if_modified_since",
        $"conditional")
      .as[(String, Option[String], Option[String], Boolean)]
      .collect().map(r => r._1.split('/').last -> (r._2, r._3, r._4))
      .toMap
    assert(got == Map(
      "1" -> ((Some("\"e1\""), None, true)),
      "2" -> ((None, Some("Mon, 01 Jun 2026 00:00:00 GMT"), true)),
      "3" -> ((Some("\"e3\""),
        Some("Tue, 02 Jun 2026 00:00:00 GMT"), true)),
      "9" -> ((None, None, false)))) // never stored → unconditional
  }

  test("sitemapResolve: nested index chains, dangling pointers, depth budget") {
    val roots = Seq((1L,
      "<sitemapindex><sitemap><loc>https://a.com/m.xml</loc></sitemap>" +
        "<sitemap><loc>https://a.com/gone.xml</loc></sitemap>" +
        "</sitemapindex>"))
      .toDF("doc_id", "xml")
    val store = Seq(
      ("https://a.com/m.xml",
        "<sitemapindex><sitemap><loc>https://a.com/l.xml</loc></sitemap>" +
          "<sitemap><loc>https://a.com/m2.xml</loc></sitemap>" +
          "</sitemapindex>"),
      ("https://a.com/l.xml",
        "<urlset><url><loc>https://a.com/p1</loc>" +
          "<lastmod>2026-01-01</lastmod></url></urlset>"),
      // m2 is ANOTHER index — still unresolved at maxDepth=2
      ("https://a.com/m2.xml",
        "<sitemapindex><sitemap><loc>https://a.com/l2.xml</loc>" +
          "</sitemap></sitemapindex>"))
      .toDF("url", "xml")
    val got = Robots.sitemapResolve(roots, store, maxDepth = 2)
      .select($"doc_id", $"depth", $"loc", $"kind")
      .as[(Long, Long, String, String)].collect().toSeq.sortBy(_._3)
    assert(got == Seq(
      (1L, 0L, "https://a.com/gone.xml", "dangling"),
      (1L, 2L, "https://a.com/l2.xml", "too_deep"),
      (1L, 2L, "https://a.com/p1", "seed")))
    // a urlset handed straight in seeds at depth 0
    val flat = Robots.sitemapResolve(
        Seq((2L, "<urlset><url><loc>https://b.com/x</loc></url></urlset>"))
          .toDF("doc_id", "xml"),
        store, maxDepth = 2)
      .select($"depth", $"loc", $"kind").as[(Long, String, String)]
      .collect().toSeq
    assert(flat == Seq((0L, "https://b.com/x", "seed")))
  }

  test("robotsRules: rules before any User-agent are ignored; empty values survive") {
    val t = "Disallow: /orphan/\nUser-agent: *\nDisallow:\nAllow: /x"
    val got = rules(t = t).orderBy($"rule_ord")
      .select($"directive", $"value").as[(String, String)].collect().toSeq
    assert(got == Seq(("disallow", ""), ("allow", "/x")))
  }

  private def decide(paths: Seq[String], agent: String,
                     t: String = txt): Map[String, (Boolean, String)] = {
    val urls = paths.zipWithIndex
      .map { case (p, i) => (i.toLong, s"https://A.com$p") }
      .toDF("doc_id", "url")
    val idx = Robots.robotsHostIndex(rules(t = t), agent)
    Robots.robotsAllowed(urls, idx)
      .select($"path", $"allowed", $"rule_pattern")
      .as[(String, Boolean, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("decision: longest match wins, allow beats disallow on ties") {
    val d = decide(Seq("/private/x", "/private/pub/y", "/open"), "nobody")
    assert(d("/private/x") == ((false, "/private/")))
    // /private/pub/ (12 chars) beats /private/ (9 chars)
    assert(d("/private/pub/y") == ((true, "/private/pub/")))
    // no rule matches -> allowed, empty pattern
    assert(d("/open") == ((true, "")))
    // explicit tie: allow and disallow same length -> allow wins
    val t = "User-agent: *\nDisallow: /abc/\nAllow: /ab*/"
    assert(decide(Seq("/abc/z"), "x", t)("/abc/z")._1)
  }

  test("decision: * wildcard and $ anchor; agent selection exact-else-star") {
    // graftbot gets ITS group, not *: /private/ is fine for it
    val d = decide(Seq("/tmp/a", "/tmp/ok", "/tmp/okay", "/private/x"),
      "GraftBot")
    assert(d("/tmp/a") == ((false, "/tmp/*")))
    // $ anchors: /tmp/ok allowed exactly, /tmp/okay is not the anchor
    // and falls to the wildcard disallow
    assert(d("/tmp/ok") == ((true, "/tmp/ok$")))
    assert(d("/tmp/okay") == ((false, "/tmp/*")))
    assert(d("/private/x")._1)
    // unknown agent falls back to the * group
    assert(!decide(Seq("/private/x"), "strangerbot")("/private/x")._1)
  }

  test("decision: empty disallow matches nothing; missing host unrestricted") {
    val t = "User-agent: graftbot\nDisallow:\nUser-agent: *\nDisallow: /"
    val d = decide(Seq("/anything"), "graftbot", t)
    assert(d("/anything") == ((true, "")))
    assert(!decide(Seq("/anything"), "elsebot", t)("/anything")._1)
    // a host with no index row at all is unrestricted
    val urls = Seq((1L, "https://noindex.example/x")).toDF("doc_id", "url")
    val got = Robots.robotsAllowed(urls,
      Robots.robotsHostIndex(rules(), "graftbot"))
      .select($"allowed", $"crawl_delay".isNull)
      .as[(Boolean, Boolean)].head()
    assert(got == ((true, true)))
  }

  test("decision: crawl_delay rides the SELECTED group only; LIKE metachars are literal") {
    // * group has delay 2; graftbot's group has none
    val urls = Seq((1L, "https://a.com/x")).toDF("doc_id", "url")
    val idx = Robots.robotsHostIndex(rules(), "graftbot")
    val gb = Robots.robotsAllowed(urls, idx)
      .select($"crawl_delay".isNull).as[Boolean].head()
    assert(gb) // exact group selected, no delay set there
    val star = Robots.robotsAllowed(urls,
      Robots.robotsHostIndex(rules(), "unmatched"))
      .select($"crawl_delay").as[Long].head()
    assert(star == 2L)
    // % and _ in a robots pattern are literals, not LIKE wildcards
    val t = "User-agent: *\nDisallow: /a%b\nDisallow: /c_d"
    val d = decide(Seq("/a%b/x", "/aXb/x", "/c_d", "/cXd"), "x", t)
    assert(!d("/a%b/x")._1 && d("/aXb/x")._1)
    assert(!d("/c_d")._1 && d("/cXd")._1)
  }

  test("non-integer crawl-delay is NULL, never a CAST_INVALID_INPUT crash") {
    // r12 ADVICE: robots.txt is untrusted — 'Crawl-delay: 0.5' in ANY
    // file must not kill the job under Spark 4's default ANSI mode.
    // try_cast matches the oracle's TRY_CAST: malformed → NULL; a
    // second well-formed delay line still wins via max().
    val t = "User-agent: *\nCrawl-delay: 0.5\nDisallow: /x/\n"
    val idx = Robots.robotsHostIndex(rules(t = t), "graftbot")
    val got = idx.select($"crawl_delay".isNull).as[Boolean].head()
    assert(got, "fractional delay should be NULL, not crash or truncate")
    val t2 = "User-agent: *\nCrawl-delay: 0.5\nCrawl-delay: 3\n"
    val d2 = Robots.robotsHostIndex(rules(t = t2), "graftbot")
      .select($"crawl_delay").as[Long].head()
    assert(d2 == 3L)
  }

  test("decision: query string participates in matching; fragment does not") {
    val t = "User-agent: *\nDisallow: /*?session=*"
    val d = decide(Seq("/page?session=9", "/page", "/page#session=9"), "x", t)
    assert(!d("/page?session=9")._1)
    assert(d("/page")._1)
    assert(d("/page")._1 && d.keySet.contains("/page"))
    // fragment stripped before matching: path is /page, allowed
    assert(d.getOrElse("/page", (false, ""))._1)
  }

  test("cachePolicy: RFC 9111 lifetime ladder and edge clamps") {
    val now = 2000000L
    def row(id: Long, cc: String, exp: String = "", date: String = "",
            lm: String = "", at: Long = 1999000L) =
      (id, s"https://a.com/$id", cc, exp, date, lm, at)
    val stored = Seq(
      row(1L, "no-store"),
      row(2L, "private, max-age=999"),         // private kills reuse
      row(3L, "s-maxage=300"),                 // s-maxage alone
      row(4L, "max-age=2000"),                 // fresh: age 1000 < 2000
      // Expires BEFORE Date clamps to 0, never negative
      row(5L, "", "Mon, 01 Jun 2026 05:00:00 GMT",
        "Mon, 01 Jun 2026 06:00:00 GMT"),
      // malformed Expires + no Last-Modified → default, not crash
      row(6L, "", "soon", "Mon, 01 Jun 2026 06:00:00 GMT"),
      // heuristic: 10% of (Date − Last-Modified) = 10% of 1h
      row(7L, "", "", "Mon, 01 Jun 2026 06:00:00 GMT",
        "Mon, 01 Jun 2026 05:00:00 GMT"))
      .toDF("doc_id", "url", "cache_control", "expires", "date",
        "last_modified", "stored_at_sec")
    val got = Robots.cachePolicy(stored, nowSec = now)
      .select($"doc_id", $"lifetime_sec", $"lifetime_source", $"fresh",
        $"next_eligible_sec")
      .as[(Long, Long, String, Boolean, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(1L) == ((0L, "no_cache", false, 1999000L)))
    assert(got(2L) == ((0L, "no_cache", false, 1999000L)))
    assert(got(3L) == ((300L, "s_maxage", false, 1999300L)))
    assert(got(4L) == ((2000L, "max_age", true, 2001000L)))
    assert(got(5L) == ((0L, "expires", false, 1999000L)))
    assert(got(6L) == ((3600L, "default", true, 2002600L)))
    assert(got(7L) == ((360L, "heuristic", false, 1999360L)))
  }

  test("robotsFreshness: TTL/grace boundaries and the refetch lattice") {
    val now = 10000000L
    val cached = Seq(
      (1L, "a.com", now - 86400L, null.asInstanceOf[java.lang.Integer]),
      (2L, "b.com", now - 86401L, null.asInstanceOf[java.lang.Integer]),
      (3L, "c.com", now - 90000L, java.lang.Integer.valueOf(301)),
      (4L, "d.com", now - 2592000L, java.lang.Integer.valueOf(503)),
      (5L, "e.com", now - 2592001L, java.lang.Integer.valueOf(503)))
      .toDF("doc_id", "host", "fetched_at_sec", "refetch_status")
    val got = Robots.robotsFreshness(cached, nowSec = now)
      .select($"doc_id", $"verdict", $"usable_cached", $"refetch")
      .as[(Long, String, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // age == TTL is still fresh (≤); one second past is not
    assert(got(1L) == (("fresh", true, false)))
    assert(got(2L) == (("stale", true, true)))
    // an unexpected refetch status (301) rides the conservative
    // grace split, not the refreshed leg
    assert(got(3L) == (("stale_served", true, true)))
    // age == grace still serves; one second past expires
    assert(got(4L) == (("stale_served", true, true)))
    assert(got(5L) == (("expired", false, true)))
  }

  test("httpDateSec: weekday ignored, malformed null, epoch exact") {
    val got = Seq(
      ("Mon, 01 Jun 2026 07:30:00 GMT"),  // correct weekday
      ("Xyz, 01 Jun 2026 07:30:00 GMT"),  // nonsense weekday: stripped
      ("01 Jun 2026 07:30:00 GMT"),       // already bare
      ("not a date"), ("")).toDF("d")
      .select(Robots.httpDateSec($"d")).as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(1780299000L), Some(1780299000L),
      Some(1780299000L), None, None))
  }
}

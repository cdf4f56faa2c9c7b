package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two crawl-ingest stages upstream of `cleaned`:
  * [[TextOps.htmlToText]] (boilerplate strip + entity decode) and
  * [[TextOps.urlCanonical]] (crawl-level dedup key). */
class HtmlUrlSpec extends SparkSpec {
  import spark.implicits._

  private def extractOne(html: String): String =
    Seq(html).toDF("html")
      .select(TextOps.htmlToText(col("html")).as("t"))
      .as[String].head()

  private def canonOne(url: String): String =
    Seq(url).toDF("url")
      .select(TextOps.urlCanonical(col("url")).as("c"))
      .as[String].head()

  // ---- htmlToText ----

  test("htmlToText strips script/style/comment interiors, keeps text nodes") {
    val html = """<html><head><title>T</title>
      |<style media="all"> body { color: #fff; } </style>
      |<script type="text/javascript">
      |  if (a < b) { document.write("<p>injected</p>"); }
      |</script></head>
      |<body><!-- hidden <b>markup</b> --><h1>Head</h1>
      |<p>one</p><p>two</p></body></html>""".stripMargin
    // title text survives (naive extraction keeps all text nodes);
    // script body — including the tag-shaped string literal — and the
    // commented-out markup do not; block tags become word boundaries
    assert(extractOne(html) == "T Head one two")
  }

  test("htmlToText decodes entities, &amp; last") {
    val html = "<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;b &amp; c &amp;lt; d</p>"
    // &amp;lt; decodes to the literal text "&lt;", NOT to "<"
    assert(extractOne(html) == "a <tag> \"q\" 's' b & c &lt; d")
  }

  test("htmlToText: tags glue as spaces, whitespace collapses, null is empty") {
    assert(extractOne("<td>a</td><td>b</td>") == "a b")
    assert(extractOne("  \n\t ") == "")
    val n = Seq(Option.empty[String]).toDF("html")
      .select(TextOps.htmlToText(col("html")).as("t")).as[String].head()
    assert(n == "")
  }

  test("htmlToText: mismatched script close does not eat the document") {
    // without backrefs script and style are separate passes; a style
    // block after an open script must not pair with it
    val html = "<script>x()</script><p>kept</p><style>.a{}</style><p>also</p>"
    assert(extractOne(html) == "kept also")
  }

  test("custom elements starting with script/style do not open a block (r11 advisory)") {
    // <script-widget> is a CUSTOM ELEMENT, not a script open tag: the
    // old `<script[^>]*>` matched it and the lazy body swallowed all
    // page text up to the next genuine </script>
    val html = "<script-widget>w</script-widget><p>page text</p>" +
      "<script>real()</script><p>tail</p>"
    assert(extractOne(html) == "w page text tail")
    val css = "<style-guide>g</style-guide><p>body</p><style>.x{}</style>"
    assert(extractOne(css) == "g body")
    // self-closing-ish and attribute forms still open blocks
    assert(extractOne("<script type=\"x\">a()</script><p>k</p>") == "k")
    assert(extractOne("<script\nasync>a()</script><p>k</p>") == "k")
  }

  test("htmlLinkCount counts anchor opens only") {
    val got = Seq("<a href=\"/x\">l</a> <abbr>n</abbr> <A\nhref='y'>m</A> <a>bare</a>")
      .toDF("html")
      .select(TextOps.htmlLinkCount(col("html")).as("n")).as[Long].head()
    assert(got == 3L) // <abbr> must not count; case + newline do
  }

  // ---- htmlToLines ----

  private def linesOne(html: String): String =
    Seq(html).toDF("html")
      .select(TextOps.htmlToLines(col("html")).as("t"))
      .as[String].head()

  test("htmlToLines: block tags become newlines, inline tags spaces") {
    val html = "<h1>Head</h1><p>one <b>bold</b> two</p><div>d</div>" +
      "<ul><li>a</li><li>b</li></ul>"
    assert(linesOne(html) == "Head\none bold two\nd\na\nb")
  }

  test("htmlToLines: blank lines drop, edges strip, entities decode") {
    val html = "<p></p><p>  </p><p>x &amp; y</p><br><br><p>z</p><p></p>"
    assert(linesOne(html) == "x & y\nz")
    assert(linesOne("<script>a()</script><style>.c{}</style>") == "")
  }

  test("htmlToLines ≡ htmlToText modulo line structure (cross-operator invariant)") {
    // substituting spaces for the line breaks must reproduce the flat
    // extraction EXACTLY — the two operators may never disagree on
    // content, only on structure. Run over real document bodies
    // wrapped in block markup plus the fixture edge cases.
    val docs = graft.sources.ChangeLogSource
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), concat(
        lit("<html><head><title>T "), col("doc_id").cast("string"),
        lit("</title><style>p{}</style></head><body><div>nav "),
        lit("<a href=\"/x\">l</a></div><script>s()</script><p>"),
        regexp_replace(col("text"), "&", "&amp;"),
        lit("</p><p>tail &lt;p&gt; block</p></body></html>")).as("html"))
    val fixtures = Seq(
      "<td>a</td><td>b</td><p>c\nd</p>",
      "<p></p><br><p> spaced   out </p><!--<p>x</p>-->").toDF("html")
      .withColumn("doc_id", lit(-1L)).select("doc_id", "html")
    val n = docs.select("doc_id", "html").unionByName(fixtures)
      .select(
        TextOps.htmlToText(col("html")).as("flat"),
        replace(TextOps.htmlToLines(col("html")), lit("\n"), lit(" "))
          .as("joined"))
      .filter(col("flat") =!= col("joined")).count()
    assert(n == 0L)
  }

  // ---- head metadata ----

  test("html head metadata: both attribute orders, case, absence, tag isolation") {
    def meta(html: String): (String, String, String) =
      Seq(html).toDF("html").select(
        TextOps.htmlTitle(col("html")).as("t"),
        TextOps.htmlMetaRobots(col("html")).as("r"),
        TextOps.htmlCanonicalHref(col("html")).as("c"))
        .as[(String, String, String)].head()
    assert(meta("<title> A \n B </title>" +
      "<meta name=\"robots\" content=\"NOINDEX, NoFollow\">" +
      "<link rel=\"canonical\" href=\"https://e.com/x\">")
      == ("A B", "noindex, nofollow", "https://e.com/x"))
    // reversed attribute orders resolve identically
    assert(meta("<meta content=\"index\" name=\"robots\">" +
      "<link href=\"https://e.com/y\" rel=\"canonical\">")
      == ("", "index", "https://e.com/y"))
    // a content= on a DIFFERENT meta tag must not leak into robots
    assert(meta("<meta name=\"description\" content=\"robots are cool\">" +
      "<meta name=\"robots\" content=\"all\">")
      == ("", "all", ""))
    // absence everywhere -> empty strings
    assert(meta("<html><head></head></html>") == ("", "", ""))
  }

  test("head metadata: single-quoted and unquoted attribute values (r11 advisory)") {
    def meta(html: String): (String, String) =
      Seq(html).toDF("html").select(
        TextOps.htmlMetaRobots(col("html")).as("r"),
        TextOps.htmlCanonicalHref(col("html")).as("c"))
        .as[(String, String)].head()
    // unquoted robots meta must NOT fail open as indexable
    assert(meta("<meta name=robots content=noindex>" +
      "<link rel=canonical href=https://e.com/u>")
      == ("noindex", "https://e.com/u"))
    // single-quoted, mixed with double-quoted, either order
    assert(meta("<meta name='robots' content='noindex, nofollow'>" +
      "<link href='https://e.com/s' rel='canonical'>")
      == ("noindex, nofollow", "https://e.com/s"))
    assert(meta("<meta content=none name=ROBOTS>")
      == ("none", ""))
    // data-name=robots is NOT a robots meta (marker needs a boundary)
    assert(meta("<meta data-name=robots content=noindex>") == ("", ""))
    // unquoted value ends at whitespace; a second attribute never leaks in
    assert(meta("<meta name=robots content=noarchive id=x>")
      == ("noarchive", ""))
    // attribute-name left edge: data-content=/data-href= never feed
    // the value (the attr marker needs a boundary, like the tag's)
    assert(meta("<meta name=robots data-content=nofollow content=all>" +
      "<link rel=canonical data-href=https://evil.example/x " +
      "href=https://e.com/good>")
      == ("all", "https://e.com/good"))
  }

  test("canonicalIdentity: declared rel=canonical beats the fetched URL, both normalized") {
    def key(url: String, html: String): String =
      Seq((url, html)).toDF("url", "html")
        .select(TextOps.canonicalIdentity(col("url"), col("html")).as("k"))
        .as[String].head()
    // declared target wins — and is itself canonicalized (messy href)
    assert(key("http://m.site.com/article?sid=99",
      "<link rel=\"canonical\" href=\"HTTP://Site.COM:80/article/?utm_source=amp\">")
      == "http://site.com/article")
    // no declaration: the fetched URL's canonical key
    assert(key("HTTP://Site.COM:80/article/?utm_source=x", "<p>no head</p>")
      == "http://site.com/article")
    // the two cases above land on the SAME identity — the point
    // unquoted declaration still counts (r11 advisory path)
    assert(key("https://x.com/a", "<link rel=canonical href=https://y.com/b>")
      == "https://y.com/b")
  }

  // ---- urlCanonical ----

  test("urlCanonical: case, default port, fragment, tracking, param order") {
    assert(canonOne("HTTP://WWW.Example.COM:80/Articles/7/?utm_source=f&b=2&a=1#frag")
      == "http://www.example.com/Articles/7?a=1&b=2")
    // the reordered variant lands on the IDENTICAL key
    assert(canonOne("http://www.example.com/Articles/7?a=1&b=2&fbclid=zz")
      == "http://www.example.com/Articles/7?a=1&b=2")
  }

  test("urlCanonical preserves what must survive") {
    // non-default port, path case, non-tracking params
    assert(canonOne("http://h.com:8080/A/b") == "http://h.com:8080/A/b")
    // https default port dropped; 443 on http is NOT a default port
    assert(canonOne("https://H.com:443/x") == "https://h.com/x")
    assert(canonOne("http://h.com:443/x") == "http://h.com:443/x")
    // `referrer=` is not the tracking param `ref`; bare `ref` is
    assert(canonOne("http://h.com/p?referrer=a&ref=b&ref")
      == "http://h.com/p?referrer=a")
  }

  test("urlCanonical: trailing slash and empty-query normalization") {
    assert(canonOne("http://h.com/a/") == "http://h.com/a")
    assert(canonOne("http://h.com/") == "http://h.com")
    assert(canonOne("http://h.com/a?utm_source=x") == "http://h.com/a")
    assert(canonOne("http://h.com/a?") == "http://h.com/a")
  }

  test("urlCanonical: \\z anchors — trailing-newline URLs never half-match (r11 advisory)") {
    // Java `$` matches BEFORE a trailing newline, RE2 `$` only at end
    // of text; with `\z` (identical in both) a newline-bearing URL
    // keeps its :80 / trailing slash verbatim in BOTH engines instead
    // of diverging from the DuckDB oracle
    assert(canonOne("http://h.com:80\n/x") == "http://h.com:80\n/x")
    assert(canonOne("http://h.com/a/\n") == "http://h.com/a/\n")
    // a tracking param with an embedded newline is still the whole
    // param ((?s:.*)) and strips in both engines
    assert(canonOne("http://h.com/p?utm_source=a\nb&k=1")
      == "http://h.com/p?k=1")
    // and the clean cases are unchanged
    assert(canonOne("http://h.com:80/x") == "http://h.com/x")
  }

  test("urlCanonical byte-sorts params") {
    // 'q2' < 'q=' in byte order ('2' = 0x32 < '=' = 0x3D)
    assert(canonOne("https://e.com/search?q=3&q2=x") == "https://e.com/search?q2=x&q=3")
  }

  test("url dedup groups: cross-variant dups collapse, others do not") {
    val docs = spark.range(0, 200).select(col("id").as("doc_id"),
      lit("t").as("text"))
    val urls = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("HTTP://Ex.COM:80/p/"),
          pmod(col("doc_id"), lit(10)).cast("string"),
          lit("/?utm_source=f&a=1")))
      .otherwise(concat(lit("http://ex.com/p/"),
        pmod(col("doc_id"), lit(10)).cast("string"),
        lit("?a=1&fbclid=z"))).as("url"))
    val groups = urls
      .groupBy(TextOps.urlCanonical(col("url")).as("canon_url"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("survivor"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // 200 docs over 10 resources; both parities canonicalize together
    assert(groups.length == 10)
    assert(groups.forall(_._2 == 20L))
    assert(groups.map(_._3).toSeq == (0L until 10L)) // min doc_id wins
  }
}

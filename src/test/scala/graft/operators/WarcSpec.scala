package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Warc.{HttpResponse, WarcFileRow, WarcRecord}

/** [[Warc]] — WARC record boundaries from binary payloads with the
  * [[HtmlBytes]] quarantine discipline, and the HTTP-response split
  * that feeds [[HtmlBytes.decodeHtmlBytes]]. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(tpe: String, uri: String, block: Array[Byte],
                  declaredLen: Long = -1L): Array[Byte] = {
    val len = if (declaredLen >= 0) declaredLen else block.length.toLong
    val uriLine = if (uri == null) "" else s"WARC-Target-URI: $uri\r\n"
    (s"WARC/1.0\r\nWARC-Type: $tpe\r\n$uriLine" +
      s"WARC-Date: 2026-06-01T00:00:00Z\r\nContent-Length: $len\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8) ++ block ++ "\r\n\r\n".getBytes
  }

  private def parse(files: (Long, Array[Byte])*): Seq[WarcRecord] =
    Warc.warcRecords(files.toSeq.toDF("id", "payload").as[WarcFileRow])
      .collect().toSeq.sortBy(r => (r.id, r.rec_ord))

  test("two records round-trip: headers, ordinals, exact block bytes") {
    val body = "<p>café</p>".getBytes(StandardCharsets.UTF_8)
    val meta = "fetch-ms 12".getBytes(StandardCharsets.US_ASCII)
    val file = rec("response", "https://a.com/p", body) ++
      rec("metadata", null, meta)
    val got = parse((1L, file))
    assert(got.map(r => (r.rec_ord, r.ok, r.warc_type, r.target_uri,
      r.content_length)) == Seq(
      (0, true, "response", "https://a.com/p", body.length.toLong),
      (1, true, "metadata", "", meta.length.toLong)))
    assert(got(0).block.sameElements(body))
    assert(got(1).block.sameElements(meta))
    assert(got.forall(_.warc_version == "1.0"))
    assert(got.forall(_.warc_date == "2026-06-01T00:00:00Z"))
  }

  test("quarantine: overrun length flags one row and stops THAT file only") {
    val good = rec("response", "https://a.com/x", "ok body".getBytes)
    val bad = rec("response", "https://a.com/y", "short".getBytes,
      declaredLen = 500L) // declares 500 octets, has 5
    val got = parse((1L, good ++ bad ++ good), (2L, good))
    val f1 = got.filter(_.id == 1L)
    // rec 0 parsed, rec 1 quarantined, the tail after the corrupt
    // length is NOT parsed (boundaries untrustworthy)
    assert(f1.map(r => (r.rec_ord, r.ok)) == Seq((0, true), (1, false)))
    assert(f1(1).content_length == -1L && f1(1).error.contains("overruns"))
    // the other file is untouched
    assert(got.filter(_.id == 2L).map(_.ok) == Seq(true))
  }

  test("quarantine: bad magic / missing length / junk bytes flag, never throw") {
    val noMagic = "HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi".getBytes
    val noLen = "WARC/1.0\r\nWARC-Type: metadata\r\n\r\nbody".getBytes
    val junk = Array[Byte](0x13, 0x37, -1, -2)
    val got = parse((1L, noMagic), (2L, noLen), (3L, junk),
      (4L, Array.empty[Byte]), (5L, null))
    assert(got.filter(_.id == 1L).map(_.error.startsWith("bad magic")) == Seq(true))
    assert(got.filter(_.id == 2L).map(_.error) ==
      Seq("missing or invalid Content-Length"))
    assert(got.filter(_.id == 3L).map(_.ok) == Seq(false))
    assert(got.count(r => r.id >= 4L) == 0) // empty files: zero rows
  }

  test("headers are case-insensitive; first occurrence wins; extra CRLFs ok") {
    val file = ("WARC/1.0\r\ncontent-length: 4\r\nWARC-TYPE: response\r\n" +
      "Content-Length: 999\r\n\r\nbody\r\n\r\n\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val got = parse((1L, file))
    assert(got.map(r => (r.rec_ord, r.ok, r.warc_type, r.content_length))
      == Seq((0, true, "response", 4L), (1, true, "metadata", 0L)))
    assert(new String(got(0).block, StandardCharsets.UTF_8) == "body")
  }

  test("httpResponses: status + charset param, body feeds decodeHtmlBytes") {
    val latin = "<p>café</p>".getBytes(StandardCharsets.ISO_8859_1)
    val http = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=ISO-8859-1\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII) ++ latin
    val nonHttp = rec("metadata", null, "x".getBytes)
    val file = rec("response", "https://a.com/p", http) ++ nonHttp
    val resp = Warc.httpResponses(
        Warc.warcRecords(Seq((1L, file)).toDF("id", "payload")
          .as[WarcFileRow]))
      .collect().toSeq
    assert(resp.size == 1) // metadata records never reach the split
    val r = resp.head
    assert(r.ok && r.status == 200 &&
      r.content_type == "text/html; charset=ISO-8859-1" &&
      r.declared_charset == "ISO-8859-1")
    assert(r.body.sameElements(latin))
    // the handoff: body + declared charset through the sniff ladder
    val decoded = HtmlBytes.decodeHtmlBytes(
      Seq((1L, r.body, r.declared_charset)).toDF("id", "payload", "declared")
        .as[HtmlBytes.HtmlBytesRow]).collect().head
    assert(decoded.ok && decoded.charset == "ISO-8859-1" &&
      decoded.html == "<p>café</p>")
  }

  test("folded header values unfold (obs-fold); folds never break parsing") {
    val file = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a.com/very\r\n\t/long/path\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val got = parse((1L, file))
    assert(got.map(r => (r.ok, r.warc_type, r.target_uri,
      r.content_length)) ==
      Seq((true, "response", "https://a.com/very /long/path", 2L)))
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  test("gzip payloads: one member or member-per-record, identical records") {
    val r0 = rec("response", "https://a.com/p", "<p>café</p>".getBytes(
      StandardCharsets.UTF_8))
    val r1 = rec("metadata", null, "fetch-ms 9".getBytes)
    // block is Array[Byte] (reference equality) — compare a value view
    def view(rs: Seq[WarcRecord]) = rs.map(r => (r.rec_ord, r.ok,
      r.warc_type, r.target_uri, r.content_length, r.block.toSeq))
    val plain = view(parse((1L, r0 ++ r1)))
    val oneMember = view(parse((1L, gz(r0 ++ r1))))
    val perRecord = view(parse((1L, gz(r0) ++ gz(r1)))) // Common Crawl layout
    assert(plain.size == 2)
    assert(oneMember == plain, "single-member gz diverged from plain")
    assert(perRecord == plain, "member-per-record gz diverged from plain")
  }

  test("corrupt gzip: records before the flaw KEPT, one flagged row at it") {
    // streaming semantics (r13 verdict item 1): a truncated trailer
    // costs the file's TAIL, never the already-parsed head — here the
    // deflate data is intact (only trailer bytes dropped) so the
    // record parses, then the trailer check flags ord 1
    val r0 = rec("response", "https://a.com/p", "body text".getBytes)
    val got = parse((1L, gz(r0).dropRight(5)), (2L, gz(r0)))
    val bad = got.filter(_.id == 1L)
    assert(bad.map(r => (r.rec_ord, r.ok)) == Seq((0, true), (1, false)))
    assert(bad(1).error.startsWith("corrupt gzip"), bad(1).error)
    assert(got.filter(_.id == 2L).map(_.ok) == Seq(true))
    // a flaw MID-deflate (bytes chopped inside the compressed data)
    // still flags before any record it would have carried
    val chopped = parse((3L, gz(r0).take(14)))
    assert(chopped.map(_.ok) == Seq(false) &&
      chopped.head.error.startsWith("corrupt gzip"))
  }

  test("size cap: over-cap block skipped as one flagged row, file continues") {
    // boundaries stay trustworthy past a too-big record (the declared
    // length is valid), so the decompression-bomb guard costs exactly
    // one row and the NEXT record still parses — never materializing
    // the oversized block
    val big = rec("response", "https://a.com/big",
      Array.fill[Byte](3000)('x'))
    val small = rec("metadata", null, "tail".getBytes)
    val got = Warc.warcRecords(
        Seq((1L, big ++ small)).toDF("id", "payload").as[WarcFileRow],
        maxBlockBytes = 1024L)
      .collect().toSeq.sortBy(_.rec_ord)
    assert(got.map(r => (r.rec_ord, r.ok)) == Seq((0, false), (1, true)))
    assert(got(0).error.contains("exceeds size cap") &&
      got(0).content_length == 3000L && got(0).block == null)
    assert(got(1).warc_type == "metadata" &&
      new String(got(1).block) == "tail")
    // same guard through the gzip leg (member-per-record layout)
    val gotGz = Warc.warcRecords(
        Seq((1L, gz(big) ++ gz(small))).toDF("id", "payload")
          .as[WarcFileRow], maxBlockBytes = 1024L)
      .collect().toSeq.sortBy(_.rec_ord)
    assert(gotGz.map(r => (r.rec_ord, r.ok)) == Seq((0, false), (1, true)))
  }

  test("revisitHeader renders a valid zero-payload record that round-trips") {
    val df = Seq(("https://a.com/p", "md5:abc123"))
      .toDF("url", "digest")
      .select(encode(Warc.revisitHeader($"url",
        lit("2026-08-01T00:00:00Z"), $"url",
        lit("2026-06-01T00:00:00Z"), $"digest"), "UTF-8").as("payload"))
      .select(lit(1L).as("id"), $"payload")
    val got = Warc.warcRecords(df.as[WarcFileRow]).collect().toSeq
    assert(got.map(r => (r.ok, r.warc_type, r.target_uri,
      r.content_length)) ==
      Seq((true, "revisit", "https://a.com/p", 0L)))
    assert(got.head.warc_version == "1.1")
    // untrusted values are CR/LF-stripped before concatenation: a
    // URI carrying raw CRLF must not inject forged header lines or a
    // premature terminator — still ONE valid record
    val hostile = Seq(("https://a.com/x\r\nContent-Length: 999",
        "md5:abc\rdef"))
      .toDF("url", "digest")
      .select(encode(Warc.revisitHeader($"url",
        lit("2026-08-01T00:00:00Z"), $"url",
        lit("2026-06-01T00:00:00Z"), $"digest"), "UTF-8").as("payload"))
      .select(lit(2L).as("id"), $"payload")
    val h = Warc.warcRecords(hostile.as[WarcFileRow]).collect().toSeq
    assert(h.map(r => (r.ok, r.warc_type, r.target_uri,
      r.content_length)) ==
      Seq((true, "revisit",
        "https://a.com/xContent-Length: 999", 0L)))
  }

  test("readWarcFilesStream: streaming source matches binaryFile source") {
    val dir = java.nio.file.Files.createTempDirectory("warc-stream")
    val r0 = rec("response", "https://a.com/x", "plain body".getBytes)
    val r1 = rec("metadata", null, "m".getBytes)
    java.nio.file.Files.write(dir.resolve("a.warc"), r0 ++ r1)
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gz(r0) ++ gz(r1))
    // c: truncated gzip — head kept, tail flagged (same as in-memory)
    java.nio.file.Files.write(dir.resolve("c.warc.gz"),
      (gz(r0) ++ gz(r1)).dropRight(5))
    def view(df: org.apache.spark.sql.DataFrame) = df
      .select($"path", $"rec_ord", $"ok", $"warc_type", $"content_length")
      .as[(String, Int, Boolean, String, Long)].collect().toSeq
      .map(r => (r._1.split('/').last, r._2, r._3, r._4, r._5))
      .sortBy(r => (r._1, r._2))
    val streamed = view(Warc.readWarcFilesStream(spark, dir.toString))
    assert(streamed.filter(_._1 == "a.warc") ==
      view(Warc.readWarcFiles(spark, dir + "/a.warc")))
    assert(streamed.filter(_._1 == "b.warc.gz") ==
      view(Warc.readWarcFiles(spark, dir + "/b.warc.gz")))
    assert(streamed.filter(_._1 == "c.warc.gz").map(r => (r._2, r._3)) ==
      Seq((0, true), (1, true), (2, false)))
  }

  test("gunzipBounded: bomb quarantines at the cap, never allocates past it") {
    val bomb = gz(Array.fill[Byte](1 << 20)(0)) // ~1 MiB of zeros, tiny gz
    val e = intercept[Warc.SizeCapExceeded](
      Warc.gunzipBounded(bomb, 64 * 1024))
    assert(e.getMessage.contains("gzip too large"))
    assert(Warc.gunzipBounded(bomb, 2 << 20).length == (1 << 20))
    // ...and through the HtmlBytes edge: one flagged row, gzip source
    val decoded = HtmlBytes.decodeHtmlBytes(
        Seq((1L, bomb, null: String)).toDF("id", "payload", "declared")
          .as[HtmlBytes.HtmlBytesRow],
        maxInflatedBytes = 64 * 1024).collect().toSeq
    assert(decoded.map(d => (d.ok, d.charset_source)) ==
      Seq((false, "gzip")))
    assert(decoded.head.error.contains("gzip too large"))
  }

  test("chunked transfer decoding: framing stripped, charset ladder intact") {
    val latin = "<p>café résumé</p>".getBytes(StandardCharsets.ISO_8859_1)
    val (c1, c2) = latin.splitAt(7)
    def hex(n: Int) = Integer.toHexString(n)
    val chunked = (s"${hex(c1.length)};ext=1\r\n").getBytes ++ c1 ++
      "\r\n".getBytes ++ s"${hex(c2.length).toUpperCase}\r\n".getBytes ++
      c2 ++ "\r\n0\r\nX-Trailer: t\r\n\r\n".getBytes
    val http = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=ISO-8859-1\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n").getBytes ++ chunked
    val file = rec("response", "https://a.com/c", http)
    val resp = Warc.httpResponses(Warc.warcRecords(
        Seq((1L, file)).toDF("id", "payload").as[WarcFileRow]))
      .collect().toSeq
    assert(resp.map(_.ok) == Seq(true))
    assert(resp.head.body.sameElements(latin)) // size lines GONE
    // the dechunked Latin-1 bytes still ride the declared-charset leg
    val decoded = HtmlBytes.decodeHtmlBytes(
      Seq((1L, resp.head.body, resp.head.declared_charset))
        .toDF("id", "payload", "declared")
        .as[HtmlBytes.HtmlBytesRow]).collect().head
    assert(decoded.ok && decoded.charset == "ISO-8859-1" &&
      decoded.html == "<p>café résumé</p>")
  }

  test("chunked transfer decoding: corrupt framing quarantines the row") {
    def mk(body: Array[Byte]) = rec("response", "https://a.com/c",
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Transfer-Encoding: gzip, chunked\r\n\r\n").getBytes ++ body)
    val badSize = mk("ZZ\r\nhello\r\n0\r\n\r\n".getBytes)
    val overrun = mk("ff\r\nshort\r\n".getBytes)
    val noCrlf = mk("5\r\nhelloXX0\r\n\r\n".getBytes)
    val resp = Warc.httpResponses(Warc.warcRecords(
        Seq((1L, badSize), (2L, overrun), (3L, noCrlf))
          .toDF("id", "payload").as[WarcFileRow]))
      .collect().toSeq.sortBy(_.id)
    assert(resp.map(_.ok) == Seq(false, false, false))
    assert(resp(0).error.contains("bad chunk size"))
    assert(resp(1).error.contains("chunk overruns block"))
    assert(resp(2).error.contains("not CRLF-terminated"))
    assert(resp.forall(_.status == 200)) // status survives for triage
    // Transfer-Encoding whose FINAL coding is not chunked: verbatim
    val notFinal = rec("response", "https://a.com/n",
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Transfer-Encoding: chunked, gzip\r\n\r\n").getBytes ++
        "raw".getBytes)
    val r2 = Warc.httpResponses(Warc.warcRecords(
        Seq((9L, notFinal)).toDF("id", "payload").as[WarcFileRow]))
      .collect().head
    assert(r2.ok && new String(r2.body) == "raw")
    // REPEATED Transfer-Encoding field lines concatenate in wire
    // order (RFC 9110 §5.3): "gzip" then "chunked" on separate lines
    // is chunked-final even though headerMap's first-occurrence pick
    // would see only "gzip"
    val twoLines = rec("response", "https://a.com/t",
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Transfer-Encoding: gzip\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n").getBytes ++
        "5\r\nhello\r\n0\r\n\r\n".getBytes)
    val r3 = Warc.httpResponses(Warc.warcRecords(
        Seq((10L, twoLines)).toDF("id", "payload").as[WarcFileRow]))
      .collect().head
    assert(r3.ok && new String(r3.body) == "hello")
  }

  test("readWarcFiles: binaryFile source over .warc and .warc.gz, path provenance") {
    val dir = java.nio.file.Files.createTempDirectory("warc-src")
    val r0 = rec("response", "https://a.com/x", "plain body".getBytes)
    val r1 = rec("metadata", null, "m".getBytes)
    java.nio.file.Files.write(dir.resolve("a.warc"), r0 ++ r1)
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gz(r0) ++ gz(r1))
    val got = Warc.readWarcFiles(spark, dir.toString)
      .select($"path", $"rec_ord", $"ok", $"warc_type", $"content_length")
      .as[(String, Int, Boolean, String, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(got.size == 4 && got.forall(_._3))
    val byFile = got.groupBy(_._1.split('/').last)
    assert(byFile.keySet == Set("a.warc", "b.warc.gz"))
    // both layouts parse to the same records, ids stable per path
    for ((_, rows) <- byFile)
      assert(rows.map(r => (r._2, r._4, r._5)) ==
        Seq((0, "response", 10L), (1, "metadata", 1L)))
  }

  test("httpResponses: malformed HTTP blocks flag, never throw") {
    val noTerm = rec("response", "https://a.com/p", "no crlfcrlf".getBytes)
    val badStatus = rec("response", "https://a.com/q",
      "GARBAGE LINE\r\n\r\nbody".getBytes)
    val resp = Warc.httpResponses(Warc.warcRecords(
        Seq((1L, noTerm ++ badStatus)).toDF("id", "payload")
          .as[WarcFileRow]))
      .collect().toSeq.sortBy(_.rec_ord)
    assert(resp.map(_.ok) == Seq(false, false))
    assert(resp(0).error.contains("no HTTP header terminator"))
    assert(resp(1).error.contains("bad status line"))
  }
}

package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/**
 * WARC (ISO 28500 / WARC/1.x) record-boundary parsing — the public
 * interchange format every 100 TB crawl corpus actually arrives in
 * (r12 verdict item 3): Common Crawl ships `.warc` files of
 * concatenated records, each a CRLF-delimited header block plus a
 * `Content-Length`-sized binary payload block. This operator is the
 * layer BELOW [[HtmlBytes.decodeHtmlBytes]]: bytes of a WARC file →
 * one row per record, response payloads split into HTTP headers and
 * body so the body bytes (plus the HTTP-declared charset) feed the
 * existing charset-sniff ladder unchanged.
 *
 * Format contract (the plain-record subset; per-record gzip members
 * are a container concern upstream of this boundary, like the video
 * sidecar):
 *  - a record starts with `WARC/<version>` CRLF, then `Name: value`
 *    header lines, then an empty line (CRLF CRLF total);
 *  - header names are case-insensitive; the block is exactly
 *    `Content-Length` octets; two CRLFs follow the block before the
 *    next record;
 *  - headers are decoded as UTF-8 strictly ([[HtmlBytes]] REPORT
 *    policy); the BLOCK stays `Array[Byte]` — it is arbitrary binary.
 *
 * Quarantine discipline ([[HtmlBytes]] row for row): a malformed
 * record — bad magic, missing/invalid Content-Length, a declared
 * length overrunning the file — yields ONE flagged row (`ok = false`,
 * the reason in `error`) carrying the file id and record ordinal, and
 * parsing of that FILE stops (record boundaries are untrustworthy
 * past a corrupt length); other files are untouched. At 100 TB
 * truncated members are the norm: one bad file costs its tail, never
 * a stage retry storm.
 *
 * Scale shape: pure payload-local narrow map (mapPartitions, zero
 * shuffle) — a WARC file is parsed where its bytes sit, and the
 * per-record rows inherit the scan's partitioning. Reference: no
 * anchor (the reference has no crawl surface); format per the public
 * IIPC warc-specifications.
 */
object Warc {

  final case class WarcFileRow(id: Long, payload: Array[Byte])
  final case class WarcRecord(id: Long, rec_ord: Int, ok: Boolean,
                              warc_version: String, warc_type: String,
                              target_uri: String, warc_date: String,
                              content_length: Long, block: Array[Byte],
                              error: String)
  final case class HttpResponse(id: Long, rec_ord: Int, ok: Boolean,
                                status: Int, content_type: String,
                                declared_charset: String,
                                body: Array[Byte], error: String)

  private val Crlf2 = Array[Byte]('\r', '\n', '\r', '\n')

  /** Index of the first CRLFCRLF at/after `from`, or -1. */
  private[operators] def indexOfCrlf2(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i + 3 < b.length) {
      if (b(i) == Crlf2(0) && b(i + 1) == Crlf2(1) &&
          b(i + 2) == Crlf2(2) && b(i + 3) == Crlf2(3)) return i
      i += 1
    }
    -1
  }

  private def decodeHeader(b: Array[Byte], from: Int, until: Int): String =
    StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      .decode(java.nio.ByteBuffer.wrap(b, from, until - from)).toString

  /** Unfold obs-fold continuations (a line starting with SP/HT
    * continues the previous header's value — the WARC grammar allows
    * folding) then build the case-insensitive `Name: value` map;
    * first occurrence wins. */
  private[operators] def headerMap(lines: Seq[String]): Map[String, String] = {
    val unfolded = lines.foldLeft(List.empty[String]) { (acc, ln) =>
      if (ln.nonEmpty && (ln.head == ' ' || ln.head == '\t') && acc.nonEmpty)
        (acc.head + " " + ln.trim) :: acc.tail
      else ln :: acc
    }.reverse
    unfolded.flatMap { ln =>
      val i = ln.indexOf(':')
      if (i <= 0) None
      else Some(ln.substring(0, i).trim.toLowerCase ->
        ln.substring(i + 1).trim)
    }.reverse.toMap // reverse so the FIRST occurrence wins the map
  }

  /** Parse one file's bytes into records; on the first malformed
    * record emit a quarantine row and stop (boundaries past a corrupt
    * length are untrustworthy). */
  private[operators] def parseFile(id: Long, payload: Array[Byte])
      : Seq[WarcRecord] = {
    val p = if (payload == null) Array.empty[Byte] else payload
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var ord = 0
    def bad(msg: String): Unit =
      out += WarcRecord(id, ord, ok = false, null, null, null, null,
        -1L, null, msg)
    var stop = false
    while (!stop && pos < p.length) {
      // tolerate extra CRLFs between records (common in the wild)
      while (pos < p.length &&
             (p(pos) == '\r'.toByte || p(pos) == '\n'.toByte)) pos += 1
      if (pos >= p.length) stop = true
      else {
        val hdrEnd = indexOfCrlf2(p, pos)
        if (hdrEnd < 0) { bad("no CRLFCRLF header terminator"); stop = true }
        else {
          val header =
            try decodeHeader(p, pos, hdrEnd)
            catch { case e: Exception =>
              bad(s"header not UTF-8: ${e.getClass.getSimpleName}")
              stop = true; null
            }
          if (!stop) {
            val lines = header.split("\r\n", -1).toSeq
            if (!lines.head.startsWith("WARC/")) {
              bad(s"bad magic: ${lines.head.take(20)}"); stop = true
            } else {
              val h = headerMap(lines.tail)
              val lenOpt = h.get("content-length")
                .flatMap(v => scala.util.Try(v.toLong).toOption)
                .filter(_ >= 0)
              lenOpt match {
                case None =>
                  bad("missing or invalid Content-Length"); stop = true
                case Some(len) =>
                  val blockStart = hdrEnd + 4
                  if (blockStart + len > p.length) {
                    bad(s"block overruns file: need $len octets, " +
                      s"have ${p.length - blockStart}")
                    stop = true
                  } else {
                    val block = java.util.Arrays.copyOfRange(
                      p, blockStart, blockStart + len.toInt)
                    out += WarcRecord(id, ord, ok = true,
                      lines.head.stripPrefix("WARC/").trim,
                      h.getOrElse("warc-type", ""),
                      h.getOrElse("warc-target-uri", ""),
                      h.getOrElse("warc-date", ""),
                      len, block, null)
                    pos = blockStart + len.toInt
                    ord += 1
                  }
              }
            }
          }
        }
      }
    }
    out.result()
  }

  /** Is this payload gzip (1F 8B magic)? */
  private[operators] def isGzip(p: Array[Byte]): Boolean =
    p != null && p.length >= 2 && p(0) == 0x1F.toByte && p(1) == 0x8B.toByte

  /** Inflate a gzip payload INCLUDING concatenated members — the
    * Common Crawl `.warc.gz` layout is one gzip member PER RECORD,
    * back to back (so a range request can start at any member); the
    * JDK's GZIPInputStream consumes successive members natively, which
    * turns the member-per-record file into exactly the plain
    * concatenated-records byte stream [[parseFile]] already parses. */
  private[operators] def gunzipAll(p: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(p), 64 * 1024)
    try in.readAllBytes() finally in.close()
  }

  /** Gunzip-if-gzip, quarantining a corrupt stream as one flagged row
    * (the whole file's boundaries are untrustworthy past bad bytes). */
  private[operators] def parseMaybeGz(id: Long, payload: Array[Byte])
      : Seq[WarcRecord] =
    if (!isGzip(payload)) parseFile(id, payload)
    else {
      val inflated =
        try Right(gunzipAll(payload))
        catch { case e: Exception =>
          Left(s"corrupt gzip: ${Option(e.getMessage)
            .getOrElse(e.getClass.getSimpleName)}")
        }
      inflated match {
        case Right(b) => parseFile(id, b)
        case Left(msg) => Seq(WarcRecord(id, 0, ok = false, null, null,
          null, null, -1L, null, msg))
      }
    }

  /** The boundary operator: every WARC file → its record rows, with
    * the [[HtmlBytes]] quarantine discipline on malformed input.
    * Accepts plain AND gzipped payloads per row (the gzip magic
    * decides) — `.warc.gz` member-per-record files inflate to the
    * identical record stream. */
  def warcRecords(files: Dataset[WarcFileRow]): Dataset[WarcRecord] = {
    implicit val enc: Encoder[WarcRecord] = Encoders.product[WarcRecord]
    files.mapPartitions(_.flatMap(f => parseMaybeGz(f.id, f.payload)))
  }

  /** FILE-SOURCE leg: read a directory of `.warc` / `.warc.gz` files
    * through Spark's binaryFile source and parse every record,
    * keeping the file path for provenance. `id` is the h60 of the
    * path (first 15 md5 hex digits as a 60-bit long — the repo-wide
    * sketch key convention), so downstream joins against
    * record-keyed frames stay integer. Each file parses where its
    * bytes land (narrow map over the scan, zero shuffle); at 100 TB
    * the parallelism is the file count, which is exactly how WARC
    * corpora are laid out for distributed readers. */
  def readWarcFiles(spark: org.apache.spark.sql.SparkSession,
                    path: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    implicit val enc: Encoder[(String, Array[Byte])] =
      Encoders.tuple(Encoders.STRING, Encoders.BINARY)
    implicit val outEnc: Encoder[(String, WarcRecord)] =
      Encoders.tuple(Encoders.STRING, Encoders.product[WarcRecord])
    files.as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(p.getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        val id = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        parseMaybeGz(id, bytes).map(r => (p, r))
      })
      .select(col("_1").as("path"), col("_2.*"))
  }

  private val CharsetParam =
    "(?i);\\s*charset\\s*=\\s*\"?([A-Za-z0-9._:-]+)".r
  private val StatusLine = "(?i)HTTP/[0-9.]+\\s+(\\d{3})".r

  /** Parse one response record's block into status, Content-Type (+
    * its charset param — what [[HtmlBytes.decodeHtmlBytes]] takes as
    * `declared`) and body bytes. */
  private[operators] def parseHttp(r: WarcRecord): HttpResponse = {
    val b = if (r.block == null) Array.empty[Byte] else r.block
    val hdrEnd = indexOfCrlf2(b, 0)
    if (hdrEnd < 0)
      HttpResponse(r.id, r.rec_ord, ok = false, -1, null, null, null,
        "no HTTP header terminator")
    else {
      try {
        val header = decodeHeader(b, 0, hdrEnd)
        val lines = header.split("\r\n", -1).toSeq
        StatusLine.findFirstMatchIn(lines.head) match {
          case None =>
            HttpResponse(r.id, r.rec_ord, ok = false, -1, null, null,
              null, s"bad status line: ${lines.head.take(20)}")
          case Some(m) =>
            val h = headerMap(lines.tail)
            val ct = h.getOrElse("content-type", "")
            val cs = CharsetParam.findFirstMatchIn(ct)
              .map(_.group(1)).orNull
            val body = java.util.Arrays.copyOfRange(b, hdrEnd + 4, b.length)
            HttpResponse(r.id, r.rec_ord, ok = true, m.group(1).toInt,
              ct, cs, body, null)
        }
      } catch { case e: Exception =>
        HttpResponse(r.id, r.rec_ord, ok = false, -1, null, null, null,
          s"HTTP header not UTF-8: ${e.getClass.getSimpleName}")
      }
    }
  }

  /** `response` records → HTTP status / Content-Type / body bytes.
    * The body plus `declared_charset` is EXACTLY the
    * [[HtmlBytes.HtmlBytesRow]] shape — the handoff that closes
    * WARC → HTTP → charset sniff → text extraction in one plan. */
  def httpResponses(records: Dataset[WarcRecord]): Dataset[HttpResponse] = {
    implicit val enc: Encoder[HttpResponse] = Encoders.product[HttpResponse]
    records.filter(r => r.ok && r.warc_type == "response")
      .mapPartitions(_.map(parseHttp))
  }
}

package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.HtmlBytes.{DecodedHtml, HtmlBytesRow}

/** [[HtmlBytes.decodeHtmlBytes]] — the byte-level crawl ingest
  * boundary: BOM / declared / meta-sniff / default resolution, strict
  * decode with quarantine, and the handoff to [[TextOps.htmlToText]]. */
class HtmlBytesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, Array[Byte], String)*): Map[Long, DecodedHtml] =
    HtmlBytes.decodeHtmlBytes(
      rows.toSeq.toDF("id", "payload", "declared").as[HtmlBytesRow])
      .collect().map(d => d.id -> d).toMap

  test("resolution ladder: bom > declared > meta > default") {
    val utf8 = "<p>café</p>".getBytes(StandardCharsets.UTF_8)
    val bom8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ utf8
    val latin = "<p>café</p>".getBytes(StandardCharsets.ISO_8859_1)
    val metaLatin = "<meta charset='iso-8859-1'><p>café</p>"
      .getBytes(StandardCharsets.ISO_8859_1)
    val utf16 = "<p>café</p>".getBytes(StandardCharsets.UTF_16) // BE BOM
    val got = run(
      (0L, utf8, null),            // default UTF-8
      (1L, bom8, "ISO-8859-1"),    // BOM beats a (wrong) declared
      (2L, latin, "ISO-8859-1"),   // declared
      (3L, metaLatin, null),       // HTML5 prescan
      (4L, utf16, null))           // UTF-16 BOM
    assert(got(0L) == DecodedHtml(0L, true, "UTF-8", "default",
      "<p>café</p>", null))
    assert(got(1L) == DecodedHtml(1L, true, "UTF-8", "bom",
      "<p>café</p>", null))
    assert(got(2L) == DecodedHtml(2L, true, "ISO-8859-1", "declared",
      "<p>café</p>", null))
    assert(got(3L) == DecodedHtml(3L, true, "ISO-8859-1", "meta",
      "<meta charset='iso-8859-1'><p>café</p>", null))
    assert(got(4L).ok && got(4L).charset_source == "bom" &&
      got(4L).charset == "UTF-16BE" && got(4L).html == "<p>café</p>")
  }

  test("UTF-32 BOMs beat the 2-byte marks they alias (no NUL mojibake)") {
    // r12 ADVICE: FF FE 00 00 starts with the UTF-16LE BOM — matching
    // 16LE first would decode NUL-interleaved text with ok=true, the
    // dedup-poisoning outcome the strict ladder exists to stop.
    val text = "<p>café</p>"
    val le32 = text.getBytes("UTF-32LE")
    val be32 = text.getBytes("UTF-32BE")
    val got = run(
      (1L, Array(0xFF, 0xFE, 0x00, 0x00).map(_.toByte) ++ le32, null),
      (2L, Array(0x00, 0x00, 0xFE, 0xFF).map(_.toByte) ++ be32, null),
      // a plain UTF-16LE BOM (not followed by 00 00) still resolves LE
      (3L, Array(0xFF, 0xFE).map(_.toByte) ++
        text.getBytes(StandardCharsets.UTF_16LE), null))
    assert(got(1L).ok && got(1L).charset == "UTF-32LE" &&
      got(1L).charset_source == "bom" && got(1L).html == text,
      s"UTF-32LE payload mis-decoded: ${got(1L)}")
    assert(!got(1L).html.contains('\u0000'))
    assert(got(2L).ok && got(2L).charset == "UTF-32BE" &&
      got(2L).html == text)
    assert(got(3L).ok && got(3L).charset == "UTF-16LE" &&
      got(3L).html == text)
  }

  test("quarantine: garbage bytes yield one flagged row, not a job failure") {
    val bad = Array(0xC3, 0x28).map(_.toByte) // invalid UTF-8 pair
    val good = "<p>ok</p>".getBytes(StandardCharsets.UTF_8)
    val got = run((1L, bad, null), (2L, good, null))
    assert(!got(1L).ok && got(1L).html == null && got(1L).error != null)
    assert(got(1L).charset == "UTF-8" && got(1L).charset_source == "default")
    assert(got(2L).ok && got(2L).html == "<p>ok</p>")
    // empty and null payloads decode to empty strings, never quarantine
    val edge = run((3L, Array.empty[Byte], null), (4L, null, "UTF-8"))
    assert(edge(3L).ok && edge(3L).html == "")
    assert(edge(4L).ok && edge(4L).html == "")
  }

  test("transport gzip inflates before the ladder; corrupt gz quarantines") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val latinMeta = "<meta charset='iso-8859-1'><p>café</p>"
      .getBytes(StandardCharsets.ISO_8859_1)
    val bom8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "<p>café</p>".getBytes(StandardCharsets.UTF_8)
    val got = run(
      (1L, gz(latinMeta), null),          // meta sniff sees INFLATED bytes
      (2L, gz(bom8), null),               // BOM inside the gz resolves
      (3L, gz(bom8).dropRight(5), null),  // truncated stream
      (4L, latinMeta, "ISO-8859-1"))      // plain passthrough unchanged
    assert(got(1L) == DecodedHtml(1L, true, "ISO-8859-1", "meta",
      "<meta charset='iso-8859-1'><p>café</p>", null))
    assert(got(2L) == DecodedHtml(2L, true, "UTF-8", "bom",
      "<p>café</p>", null))
    assert(!got(3L).ok && got(3L).charset_source == "gzip" &&
      got(3L).error.startsWith("corrupt gzip"), got(3L).toString)
    assert(got(4L).ok && got(4L).charset_source == "declared")
    // gunzip = false treats the gz bytes as content (strict decode
    // rejects the binary) — the opt-out stays available
    val raw = HtmlBytes.decodeHtmlBytes(
      Seq((9L, gz(bom8), null: String)).toDF("id", "payload", "declared")
        .as[HtmlBytesRow], gunzip = false).collect().head
    assert(!raw.ok && raw.charset_source != "gzip")
  }

  test("mimeSniff routes by magic: containers, markup (BOM'd too), unknown") {
    def sniff(payloads: (Long, Array[Byte])*): Map[Long, String] =
      payloads.toSeq.toDF("id", "p")
        .select(col("id"), HtmlBytes.mimeSniff(col("p")).as("m"))
        .as[(Long, String)].collect().toMap
    val got = sniff(
      1L -> (Array(0xFF, 0xD8, 0xFF).map(_.toByte) ++ "x".getBytes),
      2L -> Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte),
      3L -> "%PDF-1.4".getBytes,
      4L -> Array(0x1F, 0x8B, 0x08).map(_.toByte),
      5L -> "GIF89a;".getBytes,
      6L -> Array(0x50, 0x4B, 0x03, 0x04).map(_.toByte),
      7L -> ("RIFF....WAVE".getBytes),
      8L -> (Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes),
      9L -> "  \t\n<html>".getBytes,
      10L -> (Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
        "<?xml version=\"1.0\"?><urlset/>".getBytes),
      11L -> "plain prose".getBytes,
      12L -> Array.empty[Byte],
      13L -> null)
    assert(got == Map(1L -> "jpeg", 2L -> "png", 3L -> "pdf",
      4L -> "gzip", 5L -> "gif", 6L -> "zip", 7L -> "riff",
      8L -> "mp4", 9L -> "markup", 10L -> "markup", 11L -> "unknown",
      12L -> "unknown", 13L -> "unknown"))
    // short payloads never throw: a 2-byte file is just unknown/gzip
    assert(sniff(20L -> Array[Byte](0x25))(20L) == "unknown")
    assert(sniff(21L -> Array(0x1F, 0x8B).map(_.toByte))(21L) == "gzip")
  }

  test("bogus declared charset falls through instead of failing") {
    val metaLatin = "<meta charset=\"iso-8859-1\">café"
      .getBytes(StandardCharsets.ISO_8859_1)
    val plain = "plain".getBytes(StandardCharsets.UTF_8)
    val got = run(
      (1L, metaLatin, "totally-bogus!!"), // illegal name -> meta sniff
      (2L, plain, "not-a-charset"))       // unknown -> default
    assert(got(1L) == DecodedHtml(1L, true, "ISO-8859-1", "meta",
      "<meta charset=\"iso-8859-1\">café", null))
    assert(got(2L) == DecodedHtml(2L, true, "UTF-8", "default",
      "plain", null))
  }

  test("meta sniff respects the byte limit and http-equiv form") {
    val pad = ("<!-- " + ("x" * 1200) + " -->").getBytes(StandardCharsets.US_ASCII)
    val lateMeta = pad ++ "<meta charset='utf-8'>done"
      .getBytes(StandardCharsets.US_ASCII)
    val httpEquiv = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-1\">café")
      .getBytes(StandardCharsets.ISO_8859_1)
    val got = run((1L, lateMeta, null), (2L, httpEquiv, null))
    // the meta sits past the 1024-byte prescan window -> default
    assert(got(1L).charset_source == "default")
    assert(got(2L) == DecodedHtml(2L, true, "ISO-8859-1", "meta",
      "<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=ISO-8859-1\">café", null))
  }

  test("htmlToText consumes the decoded output unchanged (boundary handoff)") {
    val page = "<html><head><meta charset='iso-8859-1'><title>T</title>" +
      "</head><body><p>café &amp; crème</p></body></html>"
    val bytes = page.getBytes(StandardCharsets.ISO_8859_1)
    val decoded = HtmlBytes.decodeHtmlBytes(
      Seq((7L, bytes, null: String)).toDF("id", "payload", "declared")
        .as[HtmlBytesRow])
      .filter(col("ok"))
    val txt = decoded.select(TextOps.htmlToText(col("html")).as("t"))
      .as[String].head()
    assert(txt == "T café & crème")
  }
}

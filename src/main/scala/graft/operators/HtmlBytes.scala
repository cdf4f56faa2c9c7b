package graft.operators

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction}

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/**
 * Byte-level HTML ingest boundary (r11 verdict item 4): real crawl
 * payloads are BYTES in declared-or-sniffed encodings, so the crawl
 * contract must not start at `(url, html: string)` — this operator is
 * the edge that turns `(id, payload: binary, declared_charset)` into
 * the string rows [[TextOps.htmlToText]] / [[TextOps.htmlToLines]]
 * consume unchanged.
 *
 * Transport-gzipped payloads (Content-Encoding: gzip bodies, `.xml.gz`
 * sitemaps — the 1F 8B magic decides) inflate BEFORE the ladder;
 * corrupt streams quarantine with `charset_source = "gzip"`.
 *
 * Charset resolution order (the standard sniff ladder):
 *  1. BOM — UTF-8 `EF BB BF`, UTF-32LE `FF FE 00 00` / UTF-32BE
 *     `00 00 FE FF` (checked before the 2-byte marks they alias),
 *     UTF-16LE `FF FE`, UTF-16BE `FE FF` — is decisive and stripped
 *     from the content (`charset_source = "bom"`);
 *  2. the transport-declared charset, when present and known to the
 *     JVM ("declared"); an unknown/illegal declared name falls
 *     through rather than failing — a bogus `Content-Type` must not
 *     quarantine a perfectly decodable page;
 *  3. a `<meta charset=…>` / `http-equiv Content-Type … charset=…`
 *     sniff over the first `sniffLimit` bytes read as Latin-1 — the
 *     HTML5 prescan ("meta");
 *  4. UTF-8 ("default").
 *
 * Decode is STRICT (malformed input REPORTs, never replaces): a
 * payload whose bytes lie about their encoding yields one quarantine
 * row (`ok = false`, the decode error preserved) instead of mojibake
 * rows poisoning dedup keys downstream — the
 * [[Multimodal.decodeImagesQuarantine]] policy applied to text. At
 * 100 TB corrupt payloads are the norm; one bad blob costs one row,
 * not a stage retry storm.
 *
 * Scale shape: pure payload-local narrow map (mapPartitions, zero
 * shuffle, scan-bound at any corpus size); the sniff touches at most
 * `sniffLimit` bytes before the one full decode.
 */
object HtmlBytes {

  final case class HtmlBytesRow(id: Long, payload: Array[Byte],
                                declared: String)

  /** Inflated-size cap for one transport-gzipped DOCUMENT (64 MiB) —
    * a single HTML page past this is a decompression bomb, not
    * content (r13 ADVICE: untrusted crawl bytes must cost at most one
    * quarantine row). */
  val DefaultMaxInflatedBytes: Long = 64L * 1024 * 1024
  final case class DecodedHtml(id: Long, ok: Boolean, charset: String,
                               charset_source: String, html: String,
                               error: String)

  /** HTML5-prescan meta charset patterns over the Latin-1 view of the
    * head bytes (JVM-side only — never oracle-replayed, the oracle
    * verifies round-trips analytically). */
  private val MetaCharset =
    "(?i)<meta[ \\t\\n\\r][^>]*charset[ \\t\\n\\r]*=[ \\t\\n\\r]*[\"']?([A-Za-z0-9._:-]+)".r

  /** (charset name, source, content offset past any BOM). */
  private[operators] def resolveCharset(p: Array[Byte], declared: String,
                                        sniffLimit: Int)
      : (String, String, Int) = {
    if (p.length >= 3 && p(0) == 0xEF.toByte && p(1) == 0xBB.toByte &&
        p(2) == 0xBF.toByte)
      ("UTF-8", "bom", 3)
    // UTF-32 BOMs BEFORE UTF-16: FF FE 00 00 is a 4-byte UTF-32LE BOM
    // whose first two bytes alias the UTF-16LE BOM — matching 16LE
    // first would decode NUL-interleaved mojibake with ok=true, the
    // exact dedup-poisoning case the strict ladder exists to stop.
    else if (p.length >= 4 && p(0) == 0xFF.toByte && p(1) == 0xFE.toByte &&
        p(2) == 0x00.toByte && p(3) == 0x00.toByte)
      ("UTF-32LE", "bom", 4)
    else if (p.length >= 4 && p(0) == 0x00.toByte && p(1) == 0x00.toByte &&
        p(2) == 0xFE.toByte && p(3) == 0xFF.toByte)
      ("UTF-32BE", "bom", 4)
    else if (p.length >= 2 && p(0) == 0xFF.toByte && p(1) == 0xFE.toByte)
      ("UTF-16LE", "bom", 2)
    else if (p.length >= 2 && p(0) == 0xFE.toByte && p(1) == 0xFF.toByte)
      ("UTF-16BE", "bom", 2)
    else {
      val decl = Option(declared).map(_.trim).filter(_.nonEmpty)
        .filter(n => try Charset.isSupported(n)
                     catch { case _: Exception => false })
      decl match {
        case Some(n) => (Charset.forName(n).name(), "declared", 0)
        case None =>
          val head = new String(p, 0, math.min(sniffLimit, p.length),
            java.nio.charset.StandardCharsets.ISO_8859_1)
          MetaCharset.findFirstMatchIn(head)
            .map(_.group(1))
            .filter(n => try Charset.isSupported(n)
                         catch { case _: Exception => false })
            .map(n => (Charset.forName(n).name(), "meta", 0))
            .getOrElse(("UTF-8", "default", 0))
      }
    }
  }

  private[operators] def decodeOne(r: HtmlBytesRow, sniffLimit: Int,
                                   gunzip: Boolean = true,
                                   maxInflatedBytes: Long =
                                     DefaultMaxInflatedBytes): DecodedHtml = {
    val p0 = if (r.payload == null) Array.empty[Byte] else r.payload
    // transport-level gzip (Content-Encoding: gzip bodies, `.xml.gz`
    // sitemaps) inflates BEFORE the charset ladder — a BOM or meta
    // prescan is meaningless over deflate bytes. Inflation is a
    // BOUNDED stream copy (Warc.gunzipBounded): a decompression bomb
    // quarantines at the cap ("gzip too large") instead of OOMing the
    // executor; a corrupt stream quarantines with charset_source =
    // "gzip" so the audit sink can tell a transport corruption from
    // an encoding lie.
    val p: Array[Byte] =
      if (!gunzip || !Warc.isGzip(p0)) p0
      else try Warc.gunzipBounded(p0, maxInflatedBytes)
      catch {
        case e: Warc.SizeCapExceeded =>
          return DecodedHtml(r.id, ok = false, null, "gzip", null,
            e.getMessage)
        case e: Exception =>
          return DecodedHtml(r.id, ok = false, null, "gzip", null,
            s"corrupt gzip: ${Option(e.getMessage)
              .getOrElse(e.getClass.getSimpleName)}")
      }
    val (name, src, off) = resolveCharset(p, r.declared, sniffLimit)
    try {
      val dec = Charset.forName(name).newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val html = dec.decode(ByteBuffer.wrap(p, off, p.length - off))
        .toString
      DecodedHtml(r.id, ok = true, name, src, html, null)
    } catch {
      case e: Exception =>
        DecodedHtml(r.id, ok = false, name, src, null,
          Option(e.getMessage).getOrElse(e.getClass.getName))
    }
  }

  /** Magic-number MIME class of a binary payload — the ROUTER in
    * front of the decode edges: `gzip` → inflate first, `markup` →
    * [[decodeHtmlBytes]], image/container types →
    * [[Multimodal.decodeImagesBatched]] / the sidecar contract,
    * `unknown` → quarantine-or-archive. Detected classes: gzip, pdf,
    * jpeg, png, gif, zip, riff (wav/avi), ogg, mp4 (ftyp at offset
    * 4), markup (optional-whitespace `<`), unknown. Pure Column
    * expression over byte prefixes (hex + substring — whole-stage
    * codegen, no UDF, no mapPartitions), so it rides INSIDE any scan
    * at zero extra pass and an oracle can replay it from SQL
    * builtins. Container-probing beyond the magic (e.g. WHICH codec a
    * RIFF wraps) stays at the sidecar boundary by decision. */
  def mimeSniff(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{coalesce => fnCoalesce, _}
    val p = fnCoalesce(payload, lit(Array.empty[Byte]))
    val h4 = hex(substring(p, 1, 4)) // Spark hex() is uppercase
    val head = decode(substring(p, 1, 64), "ISO-8859-1")
    when(substring(h4, 1, 4) === "1F8B", "gzip")
      .when(h4 === "25504446", "pdf")           // %PDF
      .when(substring(h4, 1, 6) === "FFD8FF", "jpeg")
      .when(h4 === "89504E47", "png")
      .when(h4 === "47494638", "gif")           // GIF8
      .when(h4 === "504B0304", "zip")           // PK..
      .when(h4 === "52494646", "riff")          // RIFF (wav/avi)
      .when(h4 === "4F676753", "ogg")           // OggS
      .when(hex(substring(p, 5, 4)) === "66747970", "mp4") // ....ftyp
      // markup: optional UTF-8 BOM (EF BB BF reads "ï»¿" through the
      // Latin-1 probe view), optional whitespace, then `<`
      .when(regexp_extract(head,
        "^(ï»¿)?[ \\t\\r\\n]*(.)", 2) === "<", "markup")
      .otherwise("unknown")
  }

  /** The boundary operator: decode every payload, keep good rows,
    * FLAG bad ones — downstream splits on `ok` (good rows feed
    * [[TextOps.htmlToText]] unchanged; quarantine rows route to the
    * audit sink with their error strings). `gunzip = true` (default)
    * inflates transport-gzipped payloads (the 1F 8B magic decides)
    * before the charset ladder, bounded at `maxInflatedBytes`. */
  def decodeHtmlBytes(rows: Dataset[HtmlBytesRow],
                      sniffLimit: Int = 1024,
                      gunzip: Boolean = true,
                      maxInflatedBytes: Long = DefaultMaxInflatedBytes)
      : Dataset[DecodedHtml] = {
    implicit val enc: Encoder[DecodedHtml] = Encoders.product[DecodedHtml]
    rows.mapPartitions(_.map(
      decodeOne(_, sniffLimit, gunzip, maxInflatedBytes)))
  }
}

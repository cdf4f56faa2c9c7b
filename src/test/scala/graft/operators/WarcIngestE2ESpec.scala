package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The WARC FILE-SOURCE leg composed with the whole curation chain —
 * the integration the operators individually spec: a directory of
 * `.warc.gz` files (member-per-record, the Common Crawl layout) →
 * [[Warc.readWarcFiles]] → [[Warc.httpResponses]] (HTTP-declared
 * charset) → [[HtmlBytes.decodeHtmlBytes]] → [[TextOps.htmlToLines]]
 * → [[TextOps.lineDedup]]. Every count asserted exactly: the corpus
 * is synthetic, so the boilerplate df and the per-doc body lines are
 * known in closed form.
 */
class WarcIngestE2ESpec extends SparkSpec {
  import spark.implicits._

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  private def responseRecord(uri: String, html: String): Array[Byte] = {
    val body = html.getBytes(StandardCharsets.ISO_8859_1)
    val http = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=ISO-8859-1\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII) ++ body
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII) ++ http ++ "\r\n\r\n".getBytes
  }

  test("warc.gz directory -> http -> decode -> lines -> line dedup, exact counts") {
    val dir = Files.createTempDirectory("warc-e2e")
    val nFiles = 10
    val perFile = 4
    val boiler = "<p>All rights reserved worldwide café notice.</p>"
    for (f <- 0 until nFiles) {
      val bytes = (0 until perFile).map { r =>
        val id = f * perFile + r
        gz(responseRecord(s"https://w$f.example/p/$r",
          s"<html><body><p>Unique article body number $id here.</p>" +
            s"$boiler</body></html>"))
      }.reduce(_ ++ _)
      Files.write(dir.resolve(f"seg-$f%02d.warc.gz"), bytes)
    }
    val records = Warc.readWarcFiles(spark, dir.toString)
    assert(records.count() == (nFiles * perFile).toLong)
    val resp = Warc.httpResponses(records.drop("path")
      .as(Encoders.product[Warc.WarcRecord]))
    val decoded = HtmlBytes.decodeHtmlBytes(
      resp.toDF().select(col("id"), col("body").as("payload"),
          col("declared_charset").as("declared"))
        .as(Encoders.product[HtmlBytes.HtmlBytesRow])).toDF()
    // ISO-8859-1 declared via the HTTP header must actually fire:
    // the é byte (E9) is not valid UTF-8, so a wrong ladder would
    // quarantine all 40 pages
    assert(decoded.filter(col("ok")).count() == (nFiles * perFile).toLong)
    assert(decoded.filter(col("charset") === "ISO-8859-1" &&
      col("charset_source") === "declared").count() ==
      (nFiles * perFile).toLong)
    // ids are h60(path): 4 records share each file's id — carry a
    // distinct doc key forward via (id, row index within file)
    val docs = decoded
      .withColumn("doc_id", monotonically_increasing_id())
      .select(col("doc_id"),
        TextOps.htmlToLines(col("html")).as("text"))
    val deduped = TextOps.lineDedup(docs)
    // every page: ONE unique body line kept; the corpus-wide
    // boilerplate line (df = 40 > maxDf) dropped everywhere
    assert(deduped.count() == (nFiles * perFile).toLong)
    assert(deduped.filter(col("n_lines_kept") === 1 &&
      col("n_lines_dropped") === 1).count() == (nFiles * perFile).toLong)
    assert(deduped.filter(col("clean_text").contains("rights reserved"))
      .count() == 0L)
    assert(deduped.filter(col("clean_text").contains("Unique article"))
      .count() == (nFiles * perFile).toLong)
  }
}

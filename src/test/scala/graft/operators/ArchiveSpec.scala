package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Warc.WarcFileRow

/** [[Archive]] — SURT keys, the CDX byte-offset index, greedy
  * segment packing, and coalesced range-read planning; plus
  * [[Warc.responseRecord]]'s round-trip into the index. */
class ArchiveSpec extends SparkSpec {
  import spark.implicits._

  test("surtKey: host reversal, www/port/fragment/params discipline") {
    val cases = Seq(
      ("https://www.Example.com/A/b?b=2&a=1", "com,example)/a/b?a=1&b=2"),
      ("http://sub.shop.example.co.uk:80/p/", "uk,co,example,shop,sub)/p"),
      ("https://example.com:443/x#frag", "com,example)/x"),
      // non-default port survives (a distinct origin)
      ("https://example.com:8443/x", "com,example:8443)/x"),
      ("https://example.com/?utm_source=a&q=1", "com,example)?q=1"),
      // bare host: key ends at the separator
      ("https://example.com", "com,example)"),
      // no authority: raw lowercased pass-through (flag-don't-fail)
      ("not a url", "not a url"))
    val got = cases.zipWithIndex.map { case ((u, _), i) => (i, u) }
      .toDF("i", "url")
      .select($"i", Archive.surtKey($"url").as("k"))
      .as[(Int, String)].collect().toMap
    for (((u, want), i) <- cases.zipWithIndex)
      assert(got(i) == want, s"surt($u)")
  }

  test("responseRecord round-trips and cdxIndex offsets are byte-exact") {
    // non-ASCII body makes char-vs-byte length bugs visible
    val docs = Seq(
      (0L, 0L, "https://a.com/x", "<p>café zero</p>"),
      (1L, 0L, "https://a.com/y", "<p>plain</p>"),
      (2L, 1L, "https://b.com/z", "<p>naïve—dash</p>"))
      .toDF("doc_id", "file_id", "url", "body")
    val hdr = lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=utf-8\r\n\r\n")
    val rendered = docs.withColumn("record", Warc.responseRecord(
      $"url", lit("2026-08-01T00:00:00Z"), hdr, $"body"))
    val idx = Archive.cdxIndex(rendered)
      .select($"doc_id", $"file_id", $"urlkey", $"offset", $"length",
        $"record")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
      .sortBy(t => (t._2, t._1))
    // offsets: first record of each file at 0, next at prev length
    val byFile = idx.groupBy(_._2)
    for ((_, rows) <- byFile) {
      assert(rows.head._4 == 0L)
      for (Array(a, b) <- rows.sliding(2) if rows.size > 1)
        assert(b._4 == a._4 + a._5, "offset = sum of earlier lengths")
    }
    // byte-exactness: slicing the concatenated file at (offset,
    // length) yields exactly that record's bytes, and it PARSES
    val fileBytes = idx.groupBy(_._2).map { case (f, rows) =>
      f -> rows.sortBy(_._4).map(_._6).mkString("")
        .getBytes(StandardCharsets.UTF_8)
    }
    for ((d, f, _, off, len, rec) <- idx) {
      val slice = fileBytes(f).slice(off.toInt, (off + len).toInt)
      assert(slice.sameElements(rec.getBytes(StandardCharsets.UTF_8)),
        s"doc $d slice")
      val parsed = Warc.warcRecords(
        Seq((d, slice)).toDF("id", "payload").as[WarcFileRow])
        .collect().toSeq
      assert(parsed.map(p => (p.ok, p.warc_type)) ==
        Seq((true, "response")), s"doc $d parse")
    }
    assert(idx.map(_._3).toSet ==
      Set("com,a)/x", "com,a)/y", "com,b)/z"))
  }

  test("packSegments: rolls at the target, never splits a record") {
    val rows = (0L until 10L).map(i =>
      (i, i % 2, "r" * (40 + i.toInt))) // lengths 40..49
      .toDF("doc_id", "writer", "record")
    val got = Archive.packSegments(rows, targetBytes = 100L)
      .select($"writer", $"doc_id", $"length", $"bytes_before",
        $"seg_id", $"seg_offset")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    for ((w, d, len, before, seg, segOff) <- got) {
      assert(seg == before / 100L, s"writer $w doc $d")
      assert(segOff == before - seg * 100L)
      assert(len > 0)
    }
    // each writer's records are contiguous: bytes_before is the
    // running sum in doc order
    for ((_, ws) <- got.groupBy(_._1)) {
      val sorted = ws.sortBy(_._2)
      assert(sorted.head._4 == 0L)
      for (Array(a, b) <- sorted.sliding(2) if sorted.size > 1)
        assert(b._4 == a._4 + a._3)
    }
  }

  test("rangePlan: merges within gap, splits past it, per-file isolation") {
    val idx = Seq(
      // file 0: three wanted records, middle gap 10 (merges at
      // gap>=10), then a far one (never merges at gap 10)
      (0L, "k0", 0L, 50L), (0L, "k1", 60L, 40L), (0L, "k2", 500L, 20L),
      // file 1: adjacent records merge even at gap 0
      (1L, "k0", 0L, 30L), (1L, "k3", 30L, 30L),
      // unwanted rows never pull ranges together
      (0L, "skip", 100L, 300L))
      .toDF("file_id", "urlkey", "offset", "length")
    val wanted = Seq("k0", "k1", "k2", "k3").toDF("urlkey")
    def plan(gap: Long) = Archive.rangePlan(idx, wanted, gap)
      .select($"file_id", $"range_start", $"range_end", $"n_records",
        $"record_bytes")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(plan(10L) == Seq(
      (0L, 0L, 100L, 2L, 90L), (0L, 500L, 520L, 1L, 20L),
      (1L, 0L, 60L, 2L, 60L)))
    // gap 9 splits the 10-byte hole; adjacent still merges
    assert(plan(9L) == Seq(
      (0L, 0L, 50L, 1L, 50L), (0L, 60L, 100L, 1L, 40L),
      (0L, 500L, 520L, 1L, 20L), (1L, 0L, 60L, 2L, 60L)))
    // a giant gap coalesces per file but never across files
    assert(plan(1L << 40) == Seq(
      (0L, 0L, 520L, 3L, 110L), (1L, 0L, 60L, 2L, 60L)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The ARCHIVE layer of the crawl cycle — how 100 TB of fetched
 * captures are laid out for storage and random access. Public
 * contracts throughout: WARC file layout (ISO 28500), the CDX(J)
 * capture index and SURT canonical url keys (IIPC
 * warc-specifications / pywb docs; Common Crawl publishes exactly
 * this index over its WARC segments), and HTTP range reads for
 * record retrieval.
 *
 * The scale shapes: every operator here is either a narrow
 * projection (surtKey) or ONE window partitioned by a bounded unit —
 * a single WARC file's records (cdxIndex), one writer's output
 * (packSegments), one file's wanted rows (rangePlan). Nothing global,
 * nothing cartesian; parallelism is the file/writer count, exactly
 * how archive corpora shard.
 */
object Archive {

  /**
   * SURT urlkey (Sort-friendly URI Reordering Transform — the key
   * column of every public CDX index): host labels reversed and
   * comma-joined so one domain's captures sort contiguous,
   * `)` separator, then the lowercased path. `www.` is dropped
   * (pywb's canonicalizer does), default ports are dropped, query
   * params are byte-sorted with tracking params removed (the
   * [[TextOps.urlCanonical]] discipline — same [[TextOps.UrlTrackingParam]]
   * class), trailing slash runs and fragments are dropped.
   * `https://www.Example.com/A/b?b=2&a=1` → `com,example)/a?a=1&b=2`.
   * Pure string/array Column math, oracle-replayable (DuckDB:
   * `list_reverse(string_split(...))`). A url with no authority
   * yields its raw lowercased form — flag-don't-fail, the downstream
   * join just misses.
   */
  def surtKey(url: Column): Column = {
    // the component extraction is [[TextOps.urlParts]] — ONE copy
    // shared with urlCanonical, so CDX urlkeys can never drift from
    // the canonical-url dedup keys
    val p = TextOps.urlParts(url)
    // a surviving non-default port rides AFTER the reversed labels
    // (`com,example:8443)`) — splitting on '.' with the port attached
    // would glue it to the TLD label instead
    val portSuf = regexp_extract(p.host, "(:\\d+)\\z", 1)
    val host = regexp_replace(
      regexp_replace(p.host, ":\\d+\\z", ""), "^www\\.", "")
    val params = TextOps.sortedParams(lower(p.query))
    when(p.scheme === "" || p.authority === "",
        lower(coalesce(url, lit(""))))
      .otherwise(concat(
        array_join(reverse(split(host, "\\.")), ","), portSuf,
        lit(")"), lower(p.path),
        when(size(params) > 0,
          concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))))
  }

  /**
   * CDX index over RENDERED records: each row of `rendered` is one
   * WARC record's full byte string in file order, and the index row
   * carries the (offset, length) a range reader needs to fetch
   * exactly that record — `offset` is the byte sum of every earlier
   * record in the same file (UTF-8 bytes, matching what
   * [[Warc.warcRecords]] parses back), `urlkey` the SURT key the
   * public CDX format sorts by. ONE window partitioned by file,
   * ordered by `ordCol` (caller guarantees it is total per file —
   * the r4 lesson); a WARC file's record count is bounded by its
   * segment size, so no partition outgrows memory and file count is
   * the parallelism.
   */
  def cdxIndex(rendered: DataFrame, fileCol: String = "file_id",
               ordCol: String = "doc_id", recCol: String = "record",
               urlCol: String = "url"): DataFrame = {
    val w = Window.partitionBy(col(fileCol)).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    rendered
      .withColumn("length",
        length(encode(col(recCol), "UTF-8")).cast("long"))
      .withColumn("offset", coalesce(sum(col("length")).over(w), lit(0L)))
      .withColumn("urlkey", surtKey(col(urlCol)))
  }

  /**
   * Greedy segment packing — the WRITE side of the layout: records
   * stream through `nWriters` parallel writers (writer =
   * h60(url) mod n, so one host's pages spread evenly), and each
   * writer rolls to a new segment file when the running byte total
   * passes `targetBytes` (Common Crawl's layout: ~1 GB gzipped
   * segments). `seg_id = floor(bytes_before / target)` — a record
   * straddling the boundary belongs to the segment it started in, so
   * segments overshoot by at most one record (never split a record).
   * `seg_offset` is the record's byte offset within its segment. ONE
   * window per writer; writer count is chosen for the cluster, so
   * partitions stay bounded regardless of corpus size.
   */
  def packSegments(rendered: DataFrame, targetBytes: Long,
                   writerCol: String = "writer", ordCol: String = "doc_id",
                   recCol: String = "record"): DataFrame = {
    val w = Window.partitionBy(col(writerCol)).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    rendered
      .withColumn("length",
        length(encode(col(recCol), "UTF-8")).cast("long"))
      .withColumn("bytes_before",
        coalesce(sum(col("length")).over(w), lit(0L)))
      .withColumn("seg_id", (col("bytes_before") / targetBytes)
        .cast("long"))
      .withColumn("seg_offset", col("bytes_before") -
        col("seg_id") * targetBytes)
  }

  /**
   * Coalesced range-read plan — the READ side: given a CDX index and
   * a wanted-key set (a recrawl diff, a curation sample, one
   * domain's captures), merge per-file record ranges whose gap is at
   * most `gapBytes` into single reads. Reading a few big ranges
   * beats thousands of record-sized requests against object storage
   * — the request-count-vs-wasted-bytes tradeoff `gapBytes` tunes.
   * Shape: one semi-join on urlkey (broadcast when the wanted set is
   * small), then the interval-merge window per file (the
   * dup_spans_maximal pattern): a row starts a new range when its
   * offset exceeds the running max end + gap; range id is the
   * running sum of those starts; one groupBy emits
   * (file, range_start, range_end, n_records, record_bytes).
   */
  def rangePlan(index: DataFrame, wantedKeys: DataFrame,
                gapBytes: Long, fileCol: String = "file_id")
      : DataFrame = {
    val hit = index.join(wantedKeys, Seq("urlkey"), "left_semi")
    val ordW = Window.partitionBy(col(fileCol)).orderBy(col("offset"))
    val prevEnd = max(col("offset") + col("length"))
      .over(ordW.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = hit.withColumn("new_range",
      when(prevEnd.isNull || col("offset") > prevEnd + gapBytes, 1L)
        .otherwise(0L))
    val grouped = flagged.withColumn("range_id",
      sum(col("new_range")).over(
        ordW.rowsBetween(Window.unboundedPreceding, 0)))
    grouped.groupBy(col(fileCol), col("range_id"))
      .agg(min(col("offset")).as("range_start"),
        max(col("offset") + col("length")).as("range_end"),
        count(lit(1)).as("n_records"),
        sum(col("length")).as("record_bytes"))
  }
}

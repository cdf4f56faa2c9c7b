package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Streaming segment assignment ([[StreamingArchive]]) — the live twin
 * of `Archive.packSegments`. Pins:
 *  - assignments match the batch operator row for row on the same
 *    records in the same order;
 *  - cross-batch splits don't change assignments (the running total
 *    carries — the segment a record lands in is split-invariant);
 *  - writers are independent (one writer's bytes never advance
 *    another's segments);
 *  - a record never splits: one straddling the target overshoots its
 *    segment, and the NEXT segment starts at the next record;
 *  - corrupt negative lengths assign zero bytes (the total never
 *    rewinds).
 */
class StreamingArchiveSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def run(target: Long,
                  batches: Seq[Seq[(Long, Timestamp, Long, Long)]])
      : Seq[(Long, Long, Long, Long)] = {
    val input = MemoryStream[(Long, Timestamp, Long, Long)](spark)
    val rows = mutable.Buffer[(Long, Long, Long, Long)]()
    val q = StreamingArchive.pack(
        input.toDF().toDF("doc_id", "event_time", "writer", "length"),
        targetBytes = target)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("arch-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        rows ++= b.toDF()
          .select("docId", "writer", "seg_id", "seg_offset")
          .as[(Long, Long, Long, Long)](
            org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)])
          .collect()
        ()
      }.start()
    try {
      batches.foreach { rs => input.addData(rs: _*); q.processAllAvailable() }
    } finally q.stop()
    rows.toSeq.sortBy(_._1)
  }

  private val fixture = Seq(
    // writer 0: lengths 60, 60 (straddles 100 at 60), 30, 70
    (1L, ts(10), 0L, 60L), (2L, ts(20), 0L, 60L),
    (3L, ts(30), 0L, 30L), (4L, ts(40), 0L, 70L),
    // writer 1: interleaved, must not advance writer 0
    (5L, ts(15), 1L, 90L), (6L, ts(25), 1L, 20L))

  private val wantAssign = Seq(
    // writer 0: before=0 seg0/0; before=60 seg0/60 (overshoots);
    // before=120 seg1/20; before=150 seg1/50
    (1L, 0L, 0L, 0L), (2L, 0L, 0L, 60L),
    (3L, 0L, 1L, 20L), (4L, 0L, 1L, 50L),
    // writer 1: before=0 seg0/0; before=90 seg0/90
    (5L, 1L, 0L, 0L), (6L, 1L, 0L, 90L))

  test("assignments match the batch operator row for row") {
    assert(run(100L, Seq(fixture)) == wantAssign)
    // batch packSegments derives length from a record string: feed
    // synthetic records of the SAME byte lengths
    val recs = fixture.map { case (d, t, w, len) =>
      (d, t, w, "x" * len.toInt) }
      .toDF("doc_id", "event_time", "writer", "record")
    val got = graft.operators.Archive
      .packSegments(recs, targetBytes = 100L)
      .select($"doc_id", $"writer", $"seg_id", $"seg_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == wantAssign, "batch twin")
  }

  test("cross-batch splits keep the running total (split-invariant)") {
    for (cut <- 1 until fixture.size) {
      val (a, b) = fixture.splitAt(cut)
      assert(run(100L, Seq(a, b)) == wantAssign, s"cut at $cut")
    }
  }

  test("negative lengths assign zero bytes; the total never rewinds") {
    val got = run(100L, Seq(Seq(
      (1L, ts(10), 0L, 60L), (2L, ts(20), 0L, -999L),
      (3L, ts(30), 0L, 60L))))
    assert(got == Seq(
      (1L, 0L, 0L, 0L), (2L, 0L, 0L, 60L), (3L, 0L, 0L, 60L)))
  }
}

package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/**
 * [[StreamingLineDedup]] — the C4/RefinedWeb line rule on a live
 * stream. Pins the forward-only contract: first `maxDf` sighting docs
 * keep, later docs drop; short lines always keep; verdicts are
 * independent of how docs split across micro-batches; the horizon is
 * the boilerplate memory (idle keys evict and the count resets);
 * in-doc repeats of a key count the doc once.
 */
class StreamingLineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  /** Runs the verdict stream over the given doc batches; returns
    * (doc_id, line, keep, line_df) sorted by (doc_id, line). */
  private def run(batches: Seq[Seq[(Long, Timestamp, String)]],
                  maxDf: Int = 2, horizonMs: Long = 3600000L)
      : Seq[(Long, String, Boolean, Long)] = {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val rows = mutable.Buffer[(Long, String, Boolean, Long)]()
    val q = StreamingLineDedup.verdicts(
        input.toDF().toDF("doc_id", "event_time", "text"),
        maxDf = maxDf, delay = "1 second", horizonMs = horizonMs)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("slinededup-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        rows ++= b.toDF().select("docId", "line", "keep", "line_df")
          .as[(Long, String, Boolean, Long)](
            org.apache.spark.sql.Encoders.product[(Long, String, Boolean, Long)])
          .collect()
        ()
      }.start()
    try {
      batches.foreach { rs => input.addData(rs: _*); q.processAllAvailable() }
    } finally q.stop()
    rows.toSeq.sortBy(r => (r._1, r._2))
  }

  private val boiler = "all rights reserved worldwide notice"

  test("first maxDf docs keep a boilerplate line, later docs drop it") {
    val got = run(Seq(
      Seq((1L, ts(10), s"unique line one alpha\n$boiler"),
        (2L, ts(10), s"unique line two bravo\n$boiler")),
      Seq((3L, ts(11), s"unique line three charlie\n$boiler"),
        (4L, ts(11), s"unique line four delta\n$boiler"))))
    val verdicts = got.filter(_._2 == boiler)
      .map(r => r._1 -> (r._3, r._4)).toMap
    // docs 1-2 emitted before the key crossed maxDf=2; docs 3-4 after
    assert(verdicts == Map(1L -> ((true, 1L)), 2L -> ((true, 2L)),
      3L -> ((false, 3L)), 4L -> ((false, 4L))))
    // the unique body lines all keep
    assert(got.filterNot(_._2 == boiler).forall(_._3))
  }

  test("verdicts are independent of the batch split") {
    def docs(i: Long) = (i, ts(10 + i), s"unique body line $i xyz\n$boiler")
    val oneBatch = run(Seq((1L to 4L).map(docs)))
    val fourBatches = run((1L to 4L).map(i => Seq(docs(i))))
    assert(oneBatch == fourBatches)
  }

  test("short lines bypass state: always kept, never counted") {
    val got = run(Seq(
      Seq((1L, ts(10), "--\nok\nlong enough unique line"),
        (2L, ts(10), "--\nok"),
        (3L, ts(10), "--\nok"))))
    // '--' and 'ok' are short: kept in all three docs with df 0
    assert(got.filter(r => r._2 == "--" || r._2 == "ok")
      .forall(r => r._3 && r._4 == 0L))
  }

  test("horizon eviction resets the count (the boilerplate memory)") {
    val got = run(Seq(
      Seq((1L, ts(10), s"first unique body here\n$boiler"),
        (2L, ts(10), s"second unique body here\n$boiler"),
        (3L, ts(10), s"third unique body here\n$boiler")),
      // advance the watermark far past the 2 s horizon
      Seq((4L, ts(600), s"fourth unique body here\n$boiler"))),
      maxDf = 2, horizonMs = 2000L)
    val verdicts = got.filter(_._2 == boiler)
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(verdicts(3L) == ((false, 3L)))
    // after eviction the key re-admits: doc 4 sees df=1 again
    assert(verdicts(4L) == ((true, 1L)))
  }

  test("in-doc repeats count the doc once and share its verdict") {
    val got = run(Seq(
      Seq((1L, ts(10), s"$boiler\nmiddle unique line body\n$boiler"))))
    val b = got.filter(_._2 == boiler)
    assert(b.size == 2 && b.forall(r => r._3 && r._4 == 1L))
  }

  test("a doc arriving under two timestamps in one batch counts once") {
    // r12 ADVICE: adjacent-row once-counting misses a doc whose rows
    // sort non-adjacent — doc 1 appears at ts 10 AND ts 12, with doc 2
    // in between at ts 11. Per-batch doc→df tracking must count doc 1
    // exactly once and give both its occurrences the SAME verdict.
    val got = run(Seq(Seq(
      (1L, ts(10), s"$boiler\nunique alpha body line"),
      (2L, ts(11), s"$boiler\nunique bravo body line"),
      (1L, ts(12), s"$boiler\nunique charlie body line"))),
      maxDf = 1)
    val byDoc = got.filter(_._2 == boiler)
      .groupBy(_._1).view.mapValues(_.map(r => (r._3, r._4)).toSet).toMap
    assert(byDoc(1L) == Set((true, 1L)),
      s"doc 1 double-counted or verdict-split: $byDoc")
    assert(byDoc(2L) == Set((false, 2L)))
  }
}

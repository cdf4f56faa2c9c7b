package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec

/**
 * Mid-batch kill + checkpoint restart for the streaming near-dup
 * screen — the TransitionRestartSpec pattern applied to
 * [[StreamingNearDup]]'s per-bucket `flatMapGroupsWithState`: the
 * crashed batch's state version must NOT survive the crash, or the
 * replayed batch's documents would find their own buckets
 * already-owned (by their crashed first attempt) and a genuinely
 * FRESH document would be misflagged as a near-dup candidate.
 * Exact-dup fixture, so every doc either owns all of its bands or
 * none — assertions are independent of file-listing order.
 */
class NearDupRestartSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("mid-batch kill + restart: ownership exactly once, fresh docs stay fresh") {
    val inDir = Files.createTempDirectory("graft-nd-in").toString
    val outDir = Files.createTempDirectory("graft-nd-out").toString
    val ckpt = Files.createTempDirectory("graft-nd-ck").toString

    val alpha = "the quick brown fox jumps over the lazy dog while " +
      "the autumn rain falls softly on the quiet village roofs"
    val beta = "completely different content about spark structured " +
      "streaming state stores and watermark semantics today"
    val gamma = "a third unrelated document mentioning parquet row " +
      "groups column chunks and dictionary encoded page headers"
    val delta = "yet another text on broadcast joins partition pruning " +
      "and adaptive query execution in distributed engines"
    // three single-part files -> three micro-batches at
    // maxFilesPerTrigger=1; each later file re-sends an earlier text
    val files = Seq(
      Seq((1L, ts(10), alpha), (2L, ts(11), beta)),
      Seq((3L, ts(12), alpha), (4L, ts(13), gamma)), // dup + FRESH
      Seq((5L, ts(14), beta), (6L, ts(15), delta)))  // dup + FRESH
    files.foreach { rows =>
      rows.toDF("doc_id", "event_time", "text").coalesce(1)
        .write.mode(SaveMode.Append).parquet(inDir)
    }
    val crashArmed = new AtomicBoolean(true)

    def runQuery(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, event_time TIMESTAMP, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
      val q = StreamingNearDup.ownership(stream, delay = "1 hour",
          horizonMs = 3600000L)
        .writeStream
        .trigger(Trigger.ProcessingTime(50L))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[_], id: Long) =>
          if (id == 1L && crashArmed.getAndSet(false)) {
            // partial output reaches disk, then the "process" dies
            // before the batch (and its state version) commits
            StreamingNearDup.verdicts(b.toDF()).limit(1)
              .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
            throw new RuntimeException("injected mid-batch crash")
          }
          // idempotent per-batch sink: replay overwrites whole
          StreamingNearDup.verdicts(b.toDF())
            .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
          ()
        }
        .start()
      try {
        q.processAllAvailable()
        q.stop()
      } catch {
        case e: StreamingQueryException =>
          assert(e.toString.contains("injected mid-batch crash") ||
            Option(e.getCause).exists(c => Option(c.getMessage)
              .exists(_.contains("injected mid-batch crash"))), e.toString)
          q.stop()
      }
    }

    runQuery() // dies on batch 1: partial verdicts + uncommitted state
    assert(!crashArmed.get(), "crash never fired — batch sizing changed?")
    runQuery() // restart: bucket state restored, batch 1 replays whole

    val got = spark.read.parquet(s"$outDir/batch=*")
      .select(col("doc_id"), col("n_bands"), col("bands_owned"),
        col("is_candidate"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == (1L to 6L).toSet, s"docs missing/dupped: $got")
    // exact-dup groups: exactly one owner per text, the other owns 0
    for (group <- Seq(Seq(1L, 3L), Seq(2L, 5L))) {
      val owned = group.map(id => got(id)._3)
      val nb = got(group.head)._2
      assert(owned.toSet == Set(0L, nb),
        s"dup group $group must split owner/candidate: $got")
    }
    // the FRESH docs sharing the crashed/replayed batches own ALL
    // bands — leaked pre-crash state would have flipped them
    for (id <- Seq(4L, 6L)) {
      val (_, nb, own, cand) = got(id)
      assert(own == nb && !cand,
        s"fresh doc $id misflagged after replay: ${got(id)}")
    }
  }
}

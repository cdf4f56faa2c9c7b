package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec

/**
 * Kill-point soak AT SCALE RATE (r9 verdict item 7): the
 * NearDupRestartSpec crash pattern run at StreamScaleCheck's 100×
 * admission rate — 25k docs per micro-batch, 8 batches, ~1.4M live
 * (band, bucket) state rows when the mid-batch kill lands — proving
 * exactly-once ownership and idempotent per-batch sink recovery are
 * properties of the design, not of toy state sizes.
 *
 * Corpus shape: blocks of 10 consecutive docs; the block's last doc
 * re-sends the first doc's text (a 10% near-in-time duplicate mass,
 * the re-fetch/mirror-burst pattern the screen exists for), the rest
 * are unique. Ownership ground truth is exact: a duplicate's 8 bands
 * are all owned by its block head, a fresh doc owns all 8 (band
 * collisions between distinct shingle sets are ~(1.6M)²/2⁶¹ —
 * negligible, and the assertion would catch one loudly).
 */
class NearDupScaledSoakSpec extends SparkSpec {
  import spark.implicits._

  private val DocsPerBatch = 25000L
  private val Batches = 8

  test("mid-batch kill at 25k-docs/batch rate: exactly-once verdicts over ~1.4M state rows") {
    val inDir = Files.createTempDirectory("graft-ndscale-in").toString
    val outDir = Files.createTempDirectory("graft-ndscale-out").toString
    val ckpt = Files.createTempDirectory("graft-ndscale-ck").toString

    // 8 single-file batches of 25k docs, generated distributed (no
    // driver-side string materialization): doc id%10==9 duplicates
    // id-9; unique texts are 12 id-salted words (distinct shingles)
    val text = expr(
      """concat_ws(' ', transform(sequence(0, 11),
           j -> concat('t', cast(eff as string), chr(97 + j))))""")
    for (f <- 0 until Batches) {
      spark.range(f * DocsPerBatch, (f + 1) * DocsPerBatch)
        .withColumn("eff",
          when(col("id") % 10 === 9, col("id") - 9).otherwise(col("id")))
        .select(col("id").as("doc_id"),
          // 10 ms spacing: the full 200k-doc span (~33 min of event
          // time) stays inside the 1 h horizon, so no bucket evicts
          // and peak state is the full ~1.44M live buckets
          timestamp_millis(lit(1700000000000L) + col("id") * 10L)
            .as("event_time"),
          text.as("text"))
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(inDir)
    }

    val crashArmed = new AtomicBoolean(true)
    var maxStateRows = 0L

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
          if (id == 4L && crashArmed.getAndSet(false)) {
            // partial output reaches disk, then the "process" dies
            // before the batch (and its 1M-row state version) commits
            StreamingNearDup.verdicts(b.toDF()).limit(100)
              .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
            throw new RuntimeException("injected mid-batch crash")
          }
          StreamingNearDup.verdicts(b.toDF())
            .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
          ()
        }
        .start()
      try {
        q.processAllAvailable()
        q.recentProgress.foreach { p =>
          p.stateOperators.headOption.foreach(s =>
            maxStateRows = math.max(maxStateRows, s.numRowsTotal))
        }
        q.stop()
      } catch {
        case e: StreamingQueryException =>
          assert(e.toString.contains("injected mid-batch crash") ||
            Option(e.getCause).exists(c => Option(c.getMessage)
              .exists(_.contains("injected mid-batch crash"))), e.toString)
          q.stop()
      }
    }

    val t0 = System.nanoTime()
    runQuery() // processes batches 0-3, dies mid-4 with partial output
    assert(!crashArmed.get(), "crash never fired — batch sizing changed?")
    runQuery() // restart: state restored, batch 4 replays whole, 5-7 run
    val wall = (System.nanoTime() - t0) / 1e9

    val total = DocsPerBatch * Batches
    val got = spark.read.parquet(s"$outDir/batch=*")
      .select(col("doc_id"), col("n_bands"), col("bands_owned"),
        col("is_candidate"))
    // exactly once: every doc verdict present, none duplicated (the
    // crashed batch's partial 100-row file was overwritten whole)
    assert(got.count() == total, "verdict count diverges")
    assert(got.select(col("doc_id")).distinct().count() == total)
    // ownership truth at scale: duplicates own 0 bands and are
    // flagged; fresh docs own all bands and pass — INCLUDING across
    // the crashed/replayed batch boundary
    val badDup = got.filter(col("doc_id") % 10 === 9 &&
      !(col("bands_owned") === 0L && col("is_candidate"))).count()
    val badFresh = got.filter(col("doc_id") % 10 =!= 9 &&
      !(col("bands_owned") === col("n_bands") && !col("is_candidate")))
      .count()
    assert(badDup == 0L, s"$badDup duplicates mis-owned after replay")
    assert(badFresh == 0L, s"$badFresh fresh docs misflagged after replay")
    // the kill landed on REAL state: ~180k fresh docs × 8 bands live
    assert(maxStateRows >= 1400000L,
      s"soak must exercise >=1.4M state rows, saw $maxStateRows")
    info(f"scaled soak: $total docs, maxState=$maxStateRows rows, " +
      f"wall=$wall%.1fs (crash + replay included)")
  }
}

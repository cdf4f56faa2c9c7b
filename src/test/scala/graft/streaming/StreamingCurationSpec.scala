package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec
import graft.operators.TextOps

/**
 * The streaming curation FLAGSHIP (r10 verdict item 6): every
 * individually-soaked piece composed into ONE continuous pipeline —
 * file CDC ingest → [[StreamingNearDup]] screen → BPE encode under a
 * real (>64-merge, partition-local-served) tokenizer inside
 * `foreachBatch` → idempotent per-batch curated sink → packed-shard
 * manifest — with a mid-cycle kill after partial sink output, proving
 * the curated-corpus manifest is exactly-once END-TO-END: the final
 * manifest must be byte-identical to the batch-computed reference,
 * crash or no crash.
 */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("url frontier screen feeds the content pipeline: full crawl chain exactly-once across a crash") {
    // the two-query crawl architecture: a FRONTIER query (URL screen,
    // idempotent per-batch admitted-set sink) feeds a CURATION query
    // (content near-dup screen -> docstore lookup -> tokenize ->
    // curated sink) through a parquet handoff — each query owns its
    // own state and checkpoint, the handoff files are the contract
    val urlDir = Files.createTempDirectory("graft-fr-in").toString
    val frontierDir = Files.createTempDirectory("graft-fr-out").toString
    val outDir = Files.createTempDirectory("graft-fr-cur").toString
    val ckptF = Files.createTempDirectory("graft-fr-ck1").toString
    val ckptC = Files.createTempDirectory("graft-fr-ck2").toString

    def word(i: Int): String =
      (0 until 6).map(d => ('a' + (i / math.pow(6, d).toInt) % 6).toChar)
        .mkString
    def sentence(seed: Int): String =
      (0 until 12).map(j => word((seed * 13 + j * 7) % 200)).mkString(" ")
    val texts = (1 to 6).map(sentence)

    // url 4 is a canonical VARIANT of url 1 (frontier suppresses it);
    // doc 5 is a content dup of doc 2 (content screen drops it);
    // the rest are fresh on both axes
    val urlBatches = Seq(
      Seq((1L, ts(10), "http://site.com/a?k=1"),
        (2L, ts(10), "http://site.com/b")),
      Seq((3L, ts(11), "https://other.com/c"),
        (4L, ts(11), "HTTP://SITE.com:80/a/?k=1&utm_source=x#f")),
      Seq((5L, ts(12), "http://site.com/e"),
        (6L, ts(12), "http://site.com/f")))
    urlBatches.foreach { rows =>
      rows.toDF("doc_id", "event_time", "url").coalesce(1)
        .write.mode(SaveMode.Append).parquet(urlDir)
    }
    // the docstore the "fetch" stage resolves admitted ids against
    val docstore = (1 to 6).map(i =>
        (i.toLong, if (i == 5) texts(1) else texts(i - 1)))
      .toDF("doc_id", "text")
    val dsDir = Files.createTempDirectory("graft-fr-ds").toString
    docstore.write.mode(SaveMode.Overwrite).parquet(dsDir)

    val model = TextOps.bpeTrainTopK(docstore, 80)
    assert(model.merges.size > TextOps.MaxCodegenMerges)

    // ---- query 1: the frontier screen (runs to completion) ----
    val fq = StreamingUrlSeen.firstSeen(
        spark.readStream
          .schema("doc_id LONG, event_time TIMESTAMP, url STRING")
          .option("maxFilesPerTrigger", 1).parquet(urlDir),
        delay = "1 hour", horizonMs = 3600000L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptF)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], id: Long) =>
        // idempotent whole-batch overwrite: the admitted fetch set
        b.toDF().filter(col("first"))
          .select(col("docId").as("doc_id"), col("ts").as("event_time"))
          .write.mode(SaveMode.Overwrite).parquet(s"$frontierDir/batch=$id")
        ()
      }.start()
    fq.processAllAvailable(); fq.stop()
    val admitted = spark.read.parquet(s"$frontierDir/batch=*")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(admitted == Seq(1L, 2L, 3L, 5L, 6L), s"frontier: $admitted")

    // ---- query 2: content curation over the admitted set, with a
    // mid-cycle crash after partial curated output ----
    val crashArmed = new AtomicBoolean(true)
    def runCuration(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, event_time TIMESTAMP")
        .option("maxFilesPerTrigger", 1).parquet(frontierDir)
        .join(spark.read.parquet(dsDir), Seq("doc_id"))
      val q = StreamingNearDup.ownership(stream, delay = "1 hour",
          horizonMs = 3600000L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckptC)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[_], id: Long) =>
          val fresh = StreamingNearDup.verdicts(b.toDF())
            .filter(!col("is_candidate")).select(col("doc_id"))
          val kept = spark.read.parquet(dsDir)
            .join(fresh, Seq("doc_id"), "left_semi")
          val encoded = TextOps.bpeEncodeWith(kept, model)
          if (id == 1L && crashArmed.getAndSet(false)) {
            encoded.limit(1)
              .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
            throw new RuntimeException("injected mid-cycle crash")
          }
          encoded.write.mode(SaveMode.Overwrite)
            .parquet(s"$outDir/batch=$id")
          ()
        }.start()
      try { q.processAllAvailable(); q.stop() }
      catch {
        case e: StreamingQueryException =>
          assert(e.toString.contains("injected mid-cycle crash") ||
            Option(e.getCause).exists(c => Option(c.getMessage)
              .exists(_.contains("injected mid-cycle crash"))), e.toString)
          q.stop()
      }
    }
    runCuration()
    assert(!crashArmed.get(), "crash never fired — batch sizing changed?")
    runCuration()

    // end-to-end: url variant 4 never reached the content stage,
    // content dup 5 was screened there, everything else curated once
    val curated = spark.read.parquet(s"$outDir/batch=*")
    val ids = curated.select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 6L), s"curated set drifted: $ids")
    val ref = TextOps.bpeEncodeWith(
        docstore.filter($"doc_id".isin(1L, 2L, 3L, 6L)), model)
      .as[(Long, Long, Long)].collect().toSet
    val got = curated.select($"doc_id", $"n_words", $"n_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == ref, s"stream-curated counts diverged:\n$got\nvs\n$ref")
  }

  test("ingest -> near-dup screen -> BPE encode -> packed manifest survives a mid-cycle crash exactly-once") {
    val inDir = Files.createTempDirectory("graft-cur-in").toString
    val outDir = Files.createTempDirectory("graft-cur-out").toString
    val ckpt = Files.createTempDirectory("graft-cur-ck").toString

    // distinct sentences built from a shared word inventory rich
    // enough to sustain a >64-merge tokenizer (the dispatch must route
    // serving through the partition-local path, not the codegen fold)
    def word(i: Int): String =
      (0 until 6).map(d => ('a' + (i / math.pow(6, d).toInt) % 6).toChar)
        .mkString
    def sentence(seed: Int): String =
      (0 until 12).map(j => word((seed * 13 + j * 7) % 200)).mkString(" ")

    val alpha = sentence(1); val beta = sentence(2)
    val gamma = sentence(3); val delta = sentence(4)
    val eps = sentence(5); val zeta = sentence(6)
    // batch 0: two fresh; batch 1 (CRASHES mid-write): one in-horizon
    // dup + one fresh; batch 2: one dup + one fresh
    val files = Seq(
      Seq((1L, ts(10), alpha), (2L, ts(11), beta)),
      Seq((3L, ts(12), alpha), (4L, ts(13), gamma)),
      Seq((5L, ts(14), beta), (6L, ts(15), delta)))
    files.foreach { rows =>
      rows.toDF("doc_id", "event_time", "text").coalesce(1)
        .write.mode(SaveMode.Append).parquet(inDir)
    }
    val allDocs = files.flatten.toDF("doc_id", "event_time", "text")
    val extraVocab = Seq((100L, ts(1), eps), (101L, ts(2), zeta))
      .toDF("doc_id", "event_time", "text")
    // the tokenizer ships with the pipeline (trained once, served in
    // every micro-batch); >64 merges pins the local serving path
    val model = TextOps.bpeTrainTopK(
      allDocs.unionByName(extraVocab).select($"doc_id", $"text"), 80)
    assert(model.merges.size > TextOps.MaxCodegenMerges,
      s"corpus must sustain >64 merges, got ${model.merges.size}")

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
          // the per-batch curation: screen verdicts -> keep docs that
          // own ALL their bands -> docstore lookup -> tokenize under
          // the shipped model -> idempotent whole-batch overwrite
          val fresh = StreamingNearDup.verdicts(b.toDF())
            .filter(!col("is_candidate")).select(col("doc_id"))
          val kept = spark.read.parquet(inDir)
            .join(fresh, Seq("doc_id"), "left_semi")
            .select(col("doc_id"), col("text"))
          val encoded = TextOps.bpeEncodeWith(kept, model)
          if (id == 1L && crashArmed.getAndSet(false)) {
            // partial curated output reaches disk, then the "process"
            // dies before the batch (and its state version) commits
            encoded.limit(1)
              .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
            throw new RuntimeException("injected mid-cycle crash")
          }
          encoded.write.mode(SaveMode.Overwrite)
            .parquet(s"$outDir/batch=$id")
          ()
        }
        .start()
      try {
        q.processAllAvailable()
        q.stop()
      } catch {
        case e: StreamingQueryException =>
          assert(e.toString.contains("injected mid-cycle crash") ||
            Option(e.getCause).exists(c => Option(c.getMessage)
              .exists(_.contains("injected mid-cycle crash"))), e.toString)
          q.stop()
      }
    }

    runQuery() // dies mid-batch-1: partial curated rows + uncommitted state
    assert(!crashArmed.get(), "crash never fired — batch sizing changed?")
    runQuery() // restart: state restored, batch 1 replays WHOLE

    // exactly-once: the curated corpus is the fresh docs 1,2,4,6 — the
    // in-horizon dups 3 and 5 screened out — each exactly once despite
    // the crashed first attempt of batch 1
    val curated = spark.read.parquet(s"$outDir/batch=*")
    val ids = curated.select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L, 6L), s"curated set drifted: $ids")

    // token counts equal the batch-computed reference under the same
    // model (stream-side serving == batch-side serving)
    val ref = TextOps.bpeEncodeWith(
        allDocs.filter($"doc_id".isin(1L, 2L, 4L, 6L))
          .select($"doc_id", $"text"), model)
      .as[(Long, Long, Long)].collect().toSet
    val got = curated.select($"doc_id", $"n_words", $"n_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == ref, s"stream-curated counts diverged:\n$got\nvs\n$ref")

    // and the downstream packed-shard manifest is deterministic from
    // the curated counts: identical to the reference manifest row for
    // row (budget chosen so docs split across sequences)
    def manifest(counts: org.apache.spark.sql.DataFrame) =
      TextOps.packSequencesCounts(
          counts.select($"doc_id", $"n_tokens"), budget = 16L, nShards = 2)
        .select($"doc_id", $"shard", $"pos", $"n_tokens",
          $"start_off", $"first_seq", $"last_seq", $"n_seqs")
        .as[(Long, Int, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq.sorted
    assert(manifest(curated) == manifest(ref.toSeq.toDF(
      "doc_id", "n_words", "n_tokens")),
      "packed manifest must be identical from the streamed corpus")
  }
}

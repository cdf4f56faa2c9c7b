package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{ExtractionPipeline, FileChangeLogStream, GapMonitor, StreamingNearDup}

/**
 * Dev-only STREAMING scale probe (r8 verdict item 2) — the batch
 * operators' 100× story is measured in [[ScaleCheck]]; this main
 * measures the three live streaming paths at 20× and 100× event
 * RATES and prints, per micro-batch, the trigger latency and the
 * state-store row count, so the two claims the Scaladocs assert are
 * numbers instead of prose:
 *
 *  - state grows with rate × horizon, NOT with stream lifetime — the
 *    per-batch `stateRows` series must PLATEAU once the horizon is
 *    saturated and stay flat forever after (eviction keeps up);
 *  - per-batch latency does not grow with batch index at a fixed rate
 *    (no accumulating work), and grows at most linearly in the rate.
 *
 * Components: [[StreamingNearDup]] (LSH band ownership,
 * event-time-timeout state), [[GapMonitor]] (offset-gap tracking,
 * O(maxTracked) state per source), and the [[FileChangeLogStream]]
 * extraction (admission-controlled parquet micro-batches through the
 * pipe-format projection — the reference's whole job,
 * `CoordinatorRunnable.java:75-94`, at scaled rates).
 *
 * Usage: `runMain graft.StreamScaleCheck [neardup|gapmon|extract ...]`
 * (no args = all three). Prints `STREAMSCALE` lines; the SUMMARY line
 * per (component, rate) carries the plateau and flatness verdicts
 * recorded in SURVEY §10.
 */
object StreamScaleCheck {

  /** Per-batch measurements out of `recentProgress` (data batches only). */
  private def progressLines(q: StreamingQuery): Seq[(Long, Long, Long)] = {
    q.recentProgress.toSeq.filter(_.numInputRows > 0).map { p =>
      val trig = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(-1L)
      val state = p.stateOperators.headOption.map(_.numRowsTotal).getOrElse(0L)
      (p.numInputRows, trig, state)
    }
  }

  private def report(tag: String, mult: Int,
                     rows: Seq[(Long, Long, Long)]): Unit = {
    rows.zipWithIndex.foreach { case ((n, trig, state), i) =>
      println(f"STREAMSCALE $tag rate=${mult}%3dx batch=$i%2d rows=$n%7d " +
        f"trigMs=$trig%6d stateRows=$state%9d")
    }
    def median(xs: Seq[Long]): Long =
      if (xs.isEmpty) -1L else xs.sorted.apply(xs.size / 2)
    val (head, tail) = rows.map(_._2).splitAt(rows.size / 2)
    val flat = median(tail).toDouble / math.max(1L, median(head))
    val plateauWindow = rows.takeRight(3).map(_._3)
    val plateau =
      if (plateauWindow.isEmpty || plateauWindow.min == 0L) 0.0
      else plateauWindow.max.toDouble / plateauWindow.min
    println(f"STREAMSCALE SUMMARY $tag rate=${mult}%3dx batches=${rows.size} " +
      f"medTrigMsHead=${median(head)} medTrigMsTail=${median(tail)} " +
      f"flatness=$flat%.2f plateauStateRows=${plateauWindow.lastOption.getOrElse(0L)} " +
      f"plateauDrift=$plateau%.3f")
  }

  /** Rate-scaled [[StreamingNearDup.ownership]]: every batch feeds
    * `mult × 250` DISTINCT documents (12 unique tokens each → every
    * doc owns its 8 band buckets, the state-maximizing case) with
    * event time advancing 1 s per batch and a 5 s horizon — so live
    * state covers ~6 batches of buckets and must plateau there. */
  private def runNearDup(spark: SparkSession, mult: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val perBatch = mult * 250
    val batches = 14
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val own = StreamingNearDup.ownership(
      input.toDF().toDF("doc_id", "event_time", "text"),
      delay = "1 second", horizonMs = 5000L)
    val q = own.writeStream.outputMode("append").format("noop")
      .option("checkpointLocation",
        Files.createTempDirectory("ssc-nd-ck").toString)
      .start()
    try {
      var id = 0L
      for (b <- 0 until batches) {
        val ts = new Timestamp((b + 1) * 1000L)
        val data = (0 until perBatch).map { _ =>
          id += 1
          (id, ts, (0 until 12).map(j => s"t${id}x$j").mkString(" "))
        }
        input.addData(data: _*)
        q.processAllAvailable()
      }
      report("neardup", mult, progressLines(q))
    } finally q.stop()
  }

  /** 8-char word over a 7-letter alphabet — the spec corpus shape; the
    * serving stream draws words from the same 2000-word vocabulary the
    * model trained on, so the partition-local memo sees Zipf-like
    * reuse (the realistic case). */
  private def word7(i: Long): String = {
    val sb = new StringBuilder(8)
    var v = i
    for (_ <- 0 until 8) { sb += ('a' + (v % 7).toInt).toChar; v /= 7 }
    sb.toString
  }

  /** Rate-scaled BPE SERVING (r10): a 1000-merge model (trained once,
    * up front — never inside a batch) drives
    * [[graft.operators.TextOps.bpeEncodeWith]] inside `foreachBatch`
    * at `mult × 250` docs per batch through the partition-local path.
    * The ingest-path claim ("safe at any arrival rate") requires flat
    * per-batch latency at both rates; the path is stateless, so
    * stateRows stays 0. */
  private def runBpeServe(spark: SparkSession, mult: Int,
                          model: graft.operators.TextOps.BpeModel): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val perBatch = mult * 250
    val batches = 12
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ssc-bpe-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        graft.operators.TextOps.bpeEncodeWith(b.toDF(), model)
          .write.mode("overwrite").format("noop").save()
        ()
      }.start()
    try {
      var id = 0L
      for (_ <- 0 until batches) {
        val data = (0 until perBatch).map { _ =>
          id += 1
          (id, (0 until 12).map(j => word7((id * 12 + j) % 2000))
            .mkString(" "))
        }
        input.addData(data: _*)
        q.processAllAvailable()
      }
      report("bpeserve", mult, progressLines(q))
    } finally q.stop()
  }

  /** Rate-scaled [[GapMonitor]]: `mult × 500` sequential offsets per
    * batch across 4 sources, every 100th offset arriving one batch
    * late (a fill), so the missing set stays busy but bounded —
    * state must hold at O(sources), latency at O(batch). */
  private def runGapMon(spark: SparkSession, mult: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val perBatch = mult * 500
    val batches = 12
    val input = MemoryStream[GapMonitor.Offset](spark)
    val q = GapMonitor.monitor(input.toDS(), maxTracked = 10000)
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation",
        Files.createTempDirectory("ssc-gm-ck").toString)
      .start()
    try {
      var next = Array.fill(4)(0L)
      for (_ <- 0 until batches) {
        val data = Seq.newBuilder[GapMonitor.Offset]
        for (src <- 0 until 4; _ <- 0 until (perBatch / 4)) {
          val off = next(src); next(src) += 1
          if (off % 100L == 99L) {
            // hold this offset one batch (emits gap now, fill next)
            data += GapMonitor.Offset(s"src$src", off + 1); next(src) += 1
            data += GapMonitor.Offset(s"src$src", off)
          } else data += GapMonitor.Offset(s"src$src", off)
        }
        input.addData(data.result(): _*)
        q.processAllAvailable()
      }
      report("gapmon", mult, progressLines(q))
    } finally q.stop()
  }

  /** Rate-scaled file extraction: the events table replicated `mult`×
    * (id-offset, the ScaleCheck discipline) as 16 immutable parquet
    * segments, streamed through the footer-stat offset ledger and the
    * pipe projection with `maxEventsPerTrigger = mult × 2000` — so
    * BOTH rates run the same ~50 micro-batches while each batch admits
    * rate-proportional rows. Per-batch latency must be flat in batch
    * index and ≲ linear in the admitted rows. */
  private def runExtract(spark: SparkSession, mult: Int,
                         segDir: String): Unit = {
    val q = ExtractionPipeline.pipeFormat(
        spark.readStream.format(FileChangeLogStream.FormatName)
          .option("path", segDir)
          .option("maxEventsPerTrigger", mult * 2000L)
          .option("numPartitions", 8)
          .load())
      .writeStream.format("noop")
      .option("checkpointLocation",
        Files.createTempDirectory("ssc-ex-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      report("extract", mult, progressLines(q))
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.metricsEnabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val want: Set[String] =
      if (args.isEmpty) Set("neardup", "gapmon", "extract", "bpeserve")
      else args.toSet

    // the serving model trains ONCE (the train/serve boundary the
    // operator documents); 2000 distinct words sustain 1000 merges
    lazy val bpeModel = {
      import spark.implicits._
      val corpus = (0 until 2000).map(i =>
        (i.toLong, s"${word7(i)} ${word7((i * 7) % 2000)} " +
          s"${word7((i * 13) % 2000)}")).toDF("doc_id", "text")
      val m = graft.operators.TextOps.bpeTrainTopK(corpus, rounds = 1000)
      println(s"STREAMSCALE bpeserve model merges=${m.merges.size}")
      m
    }

    // events replicated mult x (ids offset per copy) as 16 disjoint
    // range segments — each parquet FILE is a segment, its footer
    // min/max of event_id is the source's offset metadata
    def segDirFor(mult: Int): String = {
      val dir = Files.createTempDirectory(s"ssc-segments-$mult").toString
      val ev0 = graft.sources.ChangeLogSource.changeLog(spark, sfDir)
      val n = ev0.agg(max(col("event_id"))).head().getLong(0) + 1L
      val ev = ev0.crossJoin(
          spark.range(mult).select(col("id").as("__c")))
        .withColumn("event_id", col("event_id") + col("__c") * n)
        .drop("__c")
      spark.conf.set("spark.sql.parquet.outputTimestampType",
        "TIMESTAMP_MICROS")
      ev.repartitionByRange(16, col("event_id"))
        .write.mode("overwrite").parquet(dir)
      println(s"STREAMSCALE segments=16 mult=$mult dir=$dir")
      dir
    }

    for (mult <- Seq(20, 100)) {
      if (want("neardup")) runNearDup(spark, mult)
      if (want("gapmon")) runGapMon(spark, mult)
      if (want("extract")) runExtract(spark, mult, segDirFor(mult))
      if (want("bpeserve")) runBpeServe(spark, mult, bpeModel)
    }
    spark.stop()
  }
}

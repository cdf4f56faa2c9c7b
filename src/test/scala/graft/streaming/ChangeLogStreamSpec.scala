package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class ChangeLogStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String = "click", userId: Long = 1L): ChangeEvent =
    ChangeEvent(id, 1700000000000000L + id * 1000000L, userId, t, 1.5, s"p$id")

  private def freshName(): String = s"t${System.nanoTime()}"

  private def tmp(): String =
    Files.createTempDirectory("graft-stream").toString

  test("micro-batch source streams appended events exactly once") {
    val name = freshName()
    val buf = ChangeLogBuffers.get(name)
    buf.append((1L to 50L).map(ev(_)))
    val q = ExtractionPipeline.readChangeLog(spark, name, numPartitions = 3)
      .writeStream.format("memory").queryName(s"m$name")
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      buf.append((51L to 80L).map(ev(_)))
      q.processAllAvailable()
      val got = spark.table(s"m$name").select("event_id").as[Long].collect()
      assert(got.sorted.toSeq == (1L to 80L))
      assert(got.length == got.distinct.length, "duplicated offsets")
    } finally q.stop()
  }

  test("restart from checkpoint resumes at committed offset (no loss/dup)") {
    val name = freshName()
    val buf = ChangeLogBuffers.get(name)
    val ckpt = tmp()
    val out = tmp()
    buf.append((1L to 30L).map(ev(_)))
    def run(): Unit = {
      val q = ExtractionPipeline.readChangeLog(spark, name)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    buf.append((31L to 60L).map(ev(_)))
    run() // second incarnation must pick up only 31..60
    val got = spark.read.parquet(out).select("event_id").as[Long].collect()
    assert(got.sorted.toSeq == (1L to 60L))
    assert(got.length == got.distinct.length)
  }

  test("admission control caps events per micro-batch") {
    val name = freshName()
    ChangeLogBuffers.get(name).append((1L to 100L).map(ev(_)))
    val q = ExtractionPipeline.readChangeLog(spark, name,
        maxEventsPerTrigger = 25L)
      .writeStream.format("memory").queryName(s"m$name")
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      assert(spark.table(s"m$name").count() == 100L)
      // 100 events / cap 25 -> at least 4 batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
      assert(q.recentProgress.forall(_.numInputRows <= 25))
    } finally q.stop()
  }

  test("tables option pushes the IN-list into the source") {
    val name = freshName()
    ChangeLogBuffers.get(name).append(Seq(
      ev(1, "click"), ev(2, "purchase"), ev(3, "error"), ev(4, "view")))
    val q = ExtractionPipeline.readChangeLog(spark, name,
        tables = Some(Seq("click", "view")))
      .writeStream.format("memory").queryName(s"m$name")
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      val got = spark.table(s"m$name").select("event_id").as[Long].collect()
      assert(got.sorted.toSeq == Seq(1L, 4L))
    } finally q.stop()
  }

  test("startAt=latest skips history like the reference coordinator") {
    val name = freshName()
    val buf = ChangeLogBuffers.get(name)
    buf.append((1L to 20L).map(ev(_)))
    val q = ExtractionPipeline.readChangeLog(spark, name, startAt = "latest")
      .writeStream.format("memory").queryName(s"m$name")
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      buf.append((21L to 25L).map(ev(_)))
      q.processAllAvailable()
      val got = spark.table(s"m$name").select("event_id").as[Long].collect()
      assert(got.sorted.toSeq == (21L to 25L))
    } finally q.stop()
  }

  test("extraction pipeline writes enriched pipe lines end-to-end") {
    val name = freshName()
    ChangeLogBuffers.get(name).append(Seq(ev(1, "click", 7), ev(2, "view", 7)))
    val out = tmp()
    val stream = ExtractionPipeline.readChangeLog(spark, name)
    val q = ExtractionPipeline.start(stream, out, tmp(), triggerMs = 100L)
    try q.processAllAvailable() finally q.stop()
    val lines = spark.read.text(out).select("value").as[String].collect().sorted
    assert(lines.length == 2)
    val cols = lines.head.split('|')
    assert(cols.length == 7)
    assert(cols(0) == "1" && cols(2) == "7" && cols(3) == "click")
    // commit_ts = max ts of txid 7's events in the batch = event 2's ts
    assert(cols(6) == (1700000000000000L + 2000000L).toString)
  }

  test("dedupRedeliveries drops replayed offsets within the watermark") {
    val input = MemoryStream[ChangeEvent](spark)
    val deduped = ExtractionPipeline.dedupRedeliveries(
      input.toDS().toDF(
        "event_id", "tsMicros", "user_id", "event_type", "value", "props")
        .withColumn("ts", expr("timestamp_micros(tsMicros)")).drop("tsMicros"))
    val q = deduped.writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      val t0 = 1700000000000000L
      input.addData(
        ChangeEvent(1, t0, 1, "click", 1.0, "p"),
        ChangeEvent(2, t0 + 1000000, 1, "view", 1.0, "p"),
        ChangeEvent(1, t0, 1, "click", 1.0, "p")) // redelivery, same batch
      q.processAllAvailable()
      // redelivery across batches, still inside the watermark window
      input.addData(ChangeEvent(2, t0 + 1000000, 1, "view", 1.0, "p"),
        ChangeEvent(3, t0 + 2000000, 1, "click", 1.0, "p"))
      q.processAllAvailable()
      val ids = spark.table("dedup_sink").select("event_id")
        .as[Long].collect()
      assert(ids.sorted.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join correlates events within the window") {
    val name = freshName()
    val t0 = 1700000000000000L
    ChangeLogBuffers.get(name).append(Seq(
      ChangeEvent(1, t0, 7, "click", 1.0, "p"),
      ChangeEvent(2, t0 + 600L * 1000000, 7, "purchase", 9.0, "p"),   // +10 min
      ChangeEvent(3, t0 + 7200L * 1000000, 7, "purchase", 9.0, "p"),  // +2 h: outside
      ChangeEvent(4, t0 + 300L * 1000000, 8, "purchase", 9.0, "p")))  // other user
    val src = ExtractionPipeline.readChangeLog(spark, name)
    val joined = ExtractionPipeline.correlate(
      src.filter($"event_type" === "click"),
      src.filter($"event_type" === "purchase"))
    val q = joined.writeStream.format("memory").queryName(s"m$name")
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      val got = spark.table(s"m$name")
        .select("l_event_id", "r_event_id").as[(Long, Long)].collect()
      assert(got.toSeq == Seq((1L, 2L))) // only the within-window same-user pair
    } finally q.stop()
  }

  test("streaming throughput query aggregates per-minute with watermark") {
    val name = freshName()
    val base = 1700000040000L // minute-aligned epoch millis
    ChangeLogBuffers.get(name).append(Seq(
      ChangeEvent(1L, base * 1000L, 1L, "click", 1.0, "p"),
      ChangeEvent(2L, (base + 10000) * 1000L, 2L, "view", 1.0, "p"),
      ChangeEvent(3L, (base + 70000) * 1000L, 1L, "click", 1.0, "p"),
      ChangeEvent(4L, (base + 200000) * 1000L, 3L, "view", 1.0, "p")))
    val q = ExtractionPipeline
      .throughputQuery(ExtractionPipeline.readChangeLog(spark, name))
      .writeStream.format("memory").queryName(s"m$name")
      .outputMode("update").option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      val got = spark.table(s"m$name")
        .select($"minute", $"n_events").as[(java.sql.Timestamp, Long)]
        .collect().map { case (m, n) => m.getTime -> n }.toMap
      assert(got(base) == 2L)          // minute 0: events 1, 2
      assert(got(base + 60000) == 1L)  // minute 1: event 3
      assert(got(base + 180000) == 1L) // minute 3: event 4
    } finally q.stop()
  }

  test("staleness listener derives now - eventTime.max with running avg") {
    val input = MemoryStream[(java.sql.Timestamp, Long)](spark)
    val fixedNow = 1700000100000L // event ts + 100 s
    val listener = new StalenessListener(() => fixedNow)
    spark.streams.addListener(listener)
    val q = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "1 second")
      .groupBy(window($"ts", "1 minute")).count()
      .writeStream.format("memory").queryName("stale_sink")
      .outputMode("update").option("checkpointLocation", tmp()).start()
    try {
      input.addData((new java.sql.Timestamp(1700000000000L), 1L))
      q.processAllAvailable()
      // allow async listener delivery
      val deadline = System.currentTimeMillis() + 10000
      while (listener.samples.forall(_.stalenessMs.isEmpty) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
    val s = listener.samples.filter(_.stalenessMs.nonEmpty)
    assert(s.nonEmpty, "no staleness sample recorded")
    assert(s.head.stalenessMs.get == 100000L)
    assert(s.head.avgStalenessMs.get == 100000.0)
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MinHashUnion
import graft.operators.Dedup

/**
 * The mergeable-sketch property under Structured Streaming: because
 * MinHashUnion is associative/commutative with a constant-size buffer,
 * the same aggregate that powers the batch corpus sketches runs as a
 * streaming group aggregate — per-batch partial sketches merge into
 * the running per-group signature without reprocessing old documents.
 * (The 100 TB shape: continuous corpus ingestion keeps live per-source
 * similarity sketches at sketch-size state cost.)
 */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming minhash-union equals the batch sketch over all input") {
    val input = MemoryStream[(String, String)](spark)
    val docs = input.toDF().toDF("lang", "text")
    val sigs = Dedup.shingleSets(docs, idCol = "lang")
      .select(col("lang"), Dedup.minhashSignature(col("sh"), 16).as("sig"))
    val sketches = sigs.groupBy(col("lang"))
      .agg(MinHashUnion.minhash_union(col("sig"), 16).as("u"))
    val q = sketches.writeStream.format("memory")
      .queryName("sketch_stream").outputMode("complete").start()
    try {
      input.addData(("en", "the quick brown fox jumps over the lazy dog"),
        ("de", "der schnelle braune fuchs springt"))
      q.processAllAvailable()
      input.addData(("en", "a different english document entirely here"),
        ("de", "noch ein deutsches dokument"))
      q.processAllAvailable()
      val streamed = spark.table("sketch_stream")
        .as[(String, Seq[Long])].collect().toMap
      // batch equivalent over the full input
      val all = Seq(
        ("en", "the quick brown fox jumps over the lazy dog"),
        ("de", "der schnelle braune fuchs springt"),
        ("en", "a different english document entirely here"),
        ("de", "noch ein deutsches dokument")).toDF("lang", "text")
      val batch = Dedup.shingleSets(all, idCol = "lang")
        .select(col("lang"), Dedup.minhashSignature(col("sh"), 16).as("sig"))
        .groupBy(col("lang"))
        .agg(MinHashUnion.minhash_union(col("sig"), 16).as("u"))
        .as[(String, Seq[Long])].collect().toMap
      assert(streamed == batch)
      assert(streamed.keySet == Set("en", "de"))
      assert(streamed.values.forall(_.size == 16))
    } finally q.stop()
  }

  test("streaming embedding-drift monitor equals the batch lattice") {
    import graft.operators.Similarity
    // dimStats is count/sum/min/max on the integer lattice — fully
    // mergeable — so the drift monitor runs as a LIVE streaming
    // aggregate against a static reference lattice: continuous
    // distribution monitoring of arriving embeddings at O(dim) state,
    // the re-index trigger as a stream instead of a nightly job.
    def vec(seed: Long): Seq[Float] =
      (0 until 8).map(d => (((seed * 31 + d * 7) % 13) - 6) / 8.0f)
    val ref = (0L until 50L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val arrivals1 = (100L until 140L).map(i => (i, vec(i * 3)))
    val arrivals2 = (140L until 180L).map(i => (i, vec(i * 5)))
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val cur = input.toDF().toDF("vec_id", "embedding")
    val drift = Similarity.embeddingDrift(ref, cur)
    val q = drift.writeStream.format("memory")
      .queryName("drift_stream").outputMode("complete").start()
    try {
      input.addData(arrivals1: _*)
      q.processAllAvailable()
      input.addData(arrivals2: _*)
      q.processAllAvailable()
      val streamed = spark.table("drift_stream")
        .select(col("dim"), col("n_ref"), col("n_cur"),
          col("mean_shift_n2").cast("long"),
          col("e2_shift_n2").cast("long"),
          col("zero_shift_n2").cast("long"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val batch = Similarity.embeddingDrift(ref,
          (arrivals1 ++ arrivals2).toDF("vec_id", "embedding"))
        .select(col("dim"), col("n_ref"), col("n_cur"),
          col("mean_shift_n2").cast("long"),
          col("e2_shift_n2").cast("long"),
          col("zero_shift_n2").cast("long"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed.map(_._1) == (0L until 8L).toSet)
    } finally q.stop()
  }

  test("foreachBatch HLL fold equals the whole-log register table") {
    import graft.operators.Sketches
    val input = MemoryStream[(Long, String, Long)](spark)
    val events = input.toDF().toDF("event_id", "event_type", "user_id")
    // the streaming cardinality fold: per micro-batch registers
    // max-merged into a running table — no raw events retained
    var acc = spark.emptyDataFrame
    val q = events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val part = Sketches.hllRegisters(batch)
        acc = if (acc.isEmpty) part.localCheckpoint(true)
              else Sketches.mergeRegisters(acc, part, "event_type")
                .localCheckpoint(true)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("hllfold").toString)
      .start()
    try {
      input.addData((1L to 400L).map(i => (i, s"t${i % 2}", i % 97)): _*)
      q.processAllAvailable()
      input.addData((401L to 800L).map(i => (i, s"t${i % 2}", i % 193)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val whole = Sketches.hllRegisters(
        (1L to 400L).map(i => (i, s"t${i % 2}", i % 97))
          .++((401L to 800L).map(i => (i, s"t${i % 2}", i % 193)))
          .toDF("event_id", "event_type", "user_id"))
      .as[(String, Long, Long)].collect().toSet
    val folded = acc.as[(String, Long, Long)].collect().toSet
    assert(folded == whole)
  }

  test("foreachBatch count-min fold equals the whole-corpus sketch") {
    import graft.operators.Sketches
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text")
    // the streaming frequency fold: per micro-batch counter tables
    // sum-merged into a running table — counter addition is
    // associative, so arrival order and batch boundaries cannot
    // change a single cell
    var acc = spark.emptyDataFrame
    val q = docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val part = Sketches.countMinWords(batch, depth = 4, width = 64)
        acc = if (acc.isEmpty) part.localCheckpoint(true)
              else Sketches.mergeCountMin(acc, part).localCheckpoint(true)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cmsfold").toString)
      .start()
    val b1 = (1L to 50L).map(i => (i, s"alpha beta w${i % 7} gamma"))
    val b2 = (51L to 90L).map(i => (i, s"alpha delta w${i % 11}"))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val whole = Sketches.countMinWords(
        (b1 ++ b2).toDF("doc_id", "text"), depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    val folded = acc.as[(Int, Long, Long)].collect().toSet
    assert(folded == whole)
  }

  test("foreachBatch applyChanges keeps a live mirror equal to the batch snapshot") {
    import java.sql.Timestamp
    import graft.operators.CdcOps
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)](spark)
    val cols = Seq("event_id", "user_id", "ts", "event_type", "value")
    val events = input.toDF().toDF(cols: _*)
    def t(ms: Long) = new Timestamp(1700000000000L + ms)
    // the consumer-side mirror: each micro-batch upserts via
    // applyChanges — state is one row per live entity, not history
    var mirror: org.apache.spark.sql.DataFrame = null
    val q = events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // applyChanges(empty, batch) compacts the first batch to one
        // row per key — the mirror invariant every later upsert keeps
        mirror = CdcOps.applyChanges(
            if (mirror == null) batch.limit(0) else mirror, batch)
          .localCheckpoint(true)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mirror").toString)
      .start()
    val b1 = (1L to 40L).map(i => (i, i % 7, t(i * 1000), s"t${i % 3}",
      i / 2.0))
    val b2 = (41L to 80L).map(i => (i, i % 7, t(i * 1000), s"t${i % 3}",
      i / 2.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val batchSnap = CdcOps.snapshotAsOf(
        (b1 ++ b2).toDF(cols: _*), lit(t(1000L * 1000)))
      .select(col("user_id"), col("event_id"), col("value"))
      .as[(Long, Long, Double)].collect().toSet
    val live = mirror.select(col("user_id"), col("event_id"), col("value"))
      .as[(Long, Long, Double)].collect().toSet
    assert(live == batchSnap && live.size == 7)
  }

  test("foreachBatch delete-aware mirror applies tombstones across batches") {
    import java.sql.Timestamp
    import graft.operators.CdcOps
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)](spark)
    val cols = Seq("event_id", "user_id", "ts", "action", "value")
    val events = input.toDF().toDF(cols: _*)
    def t(ms: Long) = new Timestamp(1700000000000L + ms)
    // live mirror with I/U/D/T semantics: the fold is idempotent
    // (absence ≡ deleted), so per-batch applyChangesWithActions keeps
    // exactly the batch-mode mirror state
    var mirror: org.apache.spark.sql.DataFrame = null
    val q = events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        mirror = CdcOps.applyChangesWithActions(
            if (mirror == null) batch.limit(0) else mirror, batch)
          .localCheckpoint(true)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mirror-del").toString)
      .start()
    // batch 1: keys 1..5 inserted; batch 2: delete 2, update 3,
    // truncate-then-insert arrives in batch 3
    val b1 = (1L to 5L).map(i => (i, i, t(i * 1000), "I", i * 1.0))
    val b2 = Seq((6L, 2L, t(6000), "D", 0.0), (7L, 3L, t(7000), "U", 3.5))
    val b3 = Seq((8L, 0L, t(8000), "T", 0.0), (9L, 9L, t(9000), "I", 9.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // deletes landed: key 2 gone, key 3 updated
      val mid = mirror.select(col("user_id"), col("value"))
        .as[(Long, Double)].collect().toMap
      assert(mid == Map(1L -> 1.0, 3L -> 3.5, 4L -> 4.0, 5L -> 5.0))
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    // truncate wiped the pre-T state; only the post-T insert lives —
    // and the live fold equals the direct batch-mode snapshot
    val live = mirror.select(col("user_id"), col("value"))
      .as[(Long, Double)].collect().toMap
    assert(live == Map(9L -> 9.0))
    val direct = CdcOps.snapshotAsOfWithActions(
        (b1 ++ b2 ++ b3).toDF(cols: _*), lit(t(9000)))
      .select(col("user_id"), col("value"))
      .as[(Long, Double)].collect().toMap
    assert(live == direct)
  }
}

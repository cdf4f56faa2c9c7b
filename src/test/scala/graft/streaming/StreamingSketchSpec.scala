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
}

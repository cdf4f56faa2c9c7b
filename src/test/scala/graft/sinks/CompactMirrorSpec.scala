package graft.sinks

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CdcOps

/**
 * Incremental mirror compaction: a change batch touching 2 of 8
 * partitions rewrites ONLY those partition directories (untouched leaf
 * files are bit-identical afterwards), the folded result equals the
 * full delete-aware mirror fold, and a batch that would empty a
 * partition is refused rather than silently resurrecting rows.
 */
class CompactMirrorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  private def leafFiles(dir: Path): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => dir.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  private def mirrorRows(dir: String) =
    spark.read.parquet(dir)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value",
        $"action", $"part")
      .collect().map(_.toString).toSet

  test("compaction rewrites only touched partitions; fold law holds") {
    val dir = Files.createTempDirectory("mirror").toString + "/m"
    // initial mirror: 64 keys in 8 partitions (part = user_id % 8)
    val base = (1L to 64L).map(u =>
      (u, u, ts(u), "seed", u * 1.0, "I", u % 8)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    base.write.partitionBy("part").parquet(dir)
    val before = leafFiles(java.nio.file.Paths.get(dir))

    // batch touching only parts 1 and 2: update key 1, delete key 2,
    // insert key 65 (65 % 8 = 1)
    val batch = Seq(
      (1L, 100L, ts(100), "upd", 11.0, "U", 1L),
      (2L, 101L, ts(100), "del", 0.0, "D", 2L),
      (65L, 102L, ts(100), "ins", 65.0, "I", 1L)
    ).toDF("user_id", "event_id", "ts", "event_type", "value", "action",
      "part")
    Sinks.compactMirror(spark, dir, batch, partCol = "part")

    // untouched partitions: identical leaf files, untouched mtimes
    val after = leafFiles(java.nio.file.Paths.get(dir))
    val untouchedBefore = before.filterNot(f =>
      f._1.contains("part=1") || f._1.contains("part=2"))
    val untouchedAfter = after.filterNot(f =>
      f._1.contains("part=1") || f._1.contains("part=2"))
    assert(untouchedBefore == untouchedAfter,
      "untouched partition files must not be rewritten")

    // result equals the full-mirror delete-aware fold
    val want = CdcOps.applyChangesWithActions(base, batch)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value",
        $"action", $"part")
      .collect().map(_.toString).toSet
    assert(mirrorRows(dir) == want)
    // spot facts: key 2 gone, key 65 present, key 1 updated
    val byKey = spark.read.parquet(dir).select($"user_id", $"event_type")
      .as[(Long, String)].collect().toMap
    assert(!byKey.contains(2L) && byKey(65L) == "ins" && byKey(1L) == "upd")
  }

  test("a batch emptying a partition is refused") {
    val dir = Files.createTempDirectory("mirror2").toString + "/m"
    val base = Seq((1L, 1L, ts(1), "seed", 1.0, "I", 0L),
      (2L, 2L, ts(1), "seed", 2.0, "I", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    base.write.partitionBy("part").parquet(dir)
    val killAll = Seq((2L, 10L, ts(10), "del", 0.0, "D", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    val e = intercept[IllegalArgumentException] {
      Sinks.compactMirror(spark, dir, killAll, partCol = "part")
    }
    assert(e.getMessage.contains("empties partition"))
    // mirror unchanged
    assert(spark.read.parquet(dir).count() == 2)
  }
}

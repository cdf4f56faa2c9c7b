package graft.sinks

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CdcOps

/**
 * Incremental mirror compaction: a change batch touching 2 of 8
 * partitions rewrites ONLY those partition directories (untouched leaf
 * files are bit-identical afterwards), the folded result equals the
 * full delete-aware mirror fold, and a batch that drains a partition
 * round-trips through the deletion-manifest sidecar — the partition
 * is absent from [[Sinks.readMirror]], untouched partitions stay
 * bit-identical, and a later re-insert un-drops it without
 * resurrecting pre-drop rows.
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

  test("a batch draining a partition round-trips through the deletion manifest") {
    val dir = Files.createTempDirectory("mirror2").toString + "/m"
    val base = Seq((1L, 1L, ts(1), "seed", 1.0, "I", 0L),
      (2L, 2L, ts(1), "seed", 2.0, "I", 1L),
      (3L, 3L, ts(1), "seed", 3.0, "I", 2L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    base.write.partitionBy("part").parquet(dir)
    val before = leafFiles(java.nio.file.Paths.get(dir))

    val killAll = Seq((2L, 10L, ts(10), "del", 0.0, "D", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    Sinks.compactMirror(spark, dir, killAll, partCol = "part")

    // the drained partition is absent through the manifest-honoring
    // reader (its stale files may remain on disk — that's the point)
    val live = Sinks.readMirror(spark, dir, "part")
    assert(live.select($"user_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(Sinks.droppedPartitions(spark, dir) == Set("1"))
    // the manifest filter PRUNES: the scan selects 2 of 3 partition
    // directories — dropped files are never read, not filtered post-scan
    val scanned = live.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned == Seq(2), s"expected 2 pruned-in partitions, got $scanned")
    // untouched partitions: bit-identical leaf files
    val after = leafFiles(java.nio.file.Paths.get(dir))
    val untouchedBefore = before.filterNot(_._1.contains("part=1"))
    val untouchedAfter = after.filterNot(_._1.contains("part=1"))
      .filterNot(_._1.contains(Sinks.DeletionManifestDir))
    assert(untouchedBefore == untouchedAfter,
      "untouched partition files must not be rewritten")
  }

  test("streaming foreachBatch compaction drains and revives partitions live") {
    // the end-to-end consumer shape: each micro-batch folds into the
    // on-disk mirror via compactMirror; one batch drains a partition
    // (manifest drop), a later one revives it — and the final
    // readMirror must equal the one-shot batch fold over everything
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("mirror-live").toString + "/m"
    val base = (1L to 8L).map(u =>
      (u, u, ts(u), "seed", u * 1.0, "I", u % 4)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    base.write.partitionBy("part").parquet(dir)

    val cols = Seq("user_id", "event_id", "ts", "event_type", "value",
      "action", "part")
    val input =
      MemoryStream[(Long, Long, java.sql.Timestamp, String, Double,
        String, Long)](spark)
    val q = input.toDF().toDF(cols: _*).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sinks.compactMirror(spark, dir, batch, partCol = "part")
      }
      .option("checkpointLocation",
        Files.createTempDirectory("mirror-live-ck").toString)
      .start()
    // keys 2 and 6 are partition 2's whole population
    val b1 = Seq((1L, 100L, ts(100), "upd", 11.0, "U", 1L))
    val b2 = Seq((2L, 101L, ts(101), "del", 0.0, "D", 2L),
      (6L, 102L, ts(101), "del", 0.0, "D", 2L))
    val b3 = Seq((9L, 103L, ts(103), "ins", 9.0, "I", 1L),
      (14L, 104L, ts(104), "ins", 14.0, "I", 2L))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      assert(Sinks.droppedPartitions(spark, dir) == Set("2"))
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    assert(Sinks.droppedPartitions(spark, dir).isEmpty)
    val live = Sinks.readMirror(spark, dir, "part")
      .select($"user_id", $"event_id", $"value", $"part".cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet
    val want = CdcOps.applyChangesWithActions(base,
        (b1 ++ b2 ++ b3).toDF(cols: _*))
      .select($"user_id", $"event_id", $"value", $"part")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(live == want, s"live mirror diverges: $live vs $want")
    assert(live.exists(r => r._1 == 14L && r._4 == 2L) &&
      !live.exists(_._1 == 2L) && !live.exists(_._1 == 6L))
  }

  test("a NULL partition survives other drops and can itself drain") {
    // review r8: NOT-IN over a raw cast is three-valued — once ANY
    // manifest entry existed, every NULL-partition row evaluated to
    // NULL and silently vanished from reads; partStr renders NULL as
    // the writer's own __HIVE_DEFAULT_PARTITION__ name instead
    val dir = Files.createTempDirectory("mirror-null").toString + "/m"
    val base = Seq(
      (1L, 1L, ts(1), "seed", 1.0, "I", Some(0L)),
      (2L, 2L, ts(1), "seed", 2.0, "I", Some(1L)),
      (3L, 3L, ts(1), "seed", 3.0, "I", None)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    base.write.partitionBy("part").parquet(dir)
    // drain partition 1: the NULL-partition row must still be read
    val drain = Seq((2L, 10L, ts(10), "del", 0.0, "D",
        Some(1L): Option[Long])).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    Sinks.compactMirror(spark, dir, drain, partCol = "part")
    assert(Sinks.droppedPartitions(spark, dir) == Set("1"))
    assert(Sinks.readMirror(spark, dir, "part")
      .select($"user_id").as[Long].collect().toSet == Set(1L, 3L))
    // a batch touching the NULL partition folds against its existing
    // rows (update key 3), not a blind overwrite
    val updNull = Seq(
      (3L, 20L, ts(20), "upd", 33.0, "U", None: Option[Long]),
      (4L, 21L, ts(20), "ins", 4.0, "I", None: Option[Long])).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    Sinks.compactMirror(spark, dir, updNull, partCol = "part")
    val live = Sinks.readMirror(spark, dir, "part")
      .select($"user_id", $"value").as[(Long, Double)].collect().toMap
    assert(live == Map(1L -> 1.0, 3L -> 33.0, 4L -> 4.0))
    // and the NULL partition itself can drain through the manifest
    val drainNull = Seq(
      (3L, 30L, ts(30), "del", 0.0, "D", None: Option[Long]),
      (4L, 31L, ts(30), "del", 0.0, "D", None: Option[Long])).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    Sinks.compactMirror(spark, dir, drainNull, partCol = "part")
    assert(Sinks.droppedPartitions(spark, dir) ==
      Set("1", "__HIVE_DEFAULT_PARTITION__"))
    assert(Sinks.readMirror(spark, dir, "part")
      .select($"user_id").as[Long].collect().toSet == Set(1L))
  }

  test("kill point between data write and manifest write: drain retry converges") {
    // r8 verdict item 3: the documented crash window, EXERCISED. A
    // crash after the data write but before the manifest write leaves
    // the drained partition's stale files visible — and retrying the
    // batch must converge to the no-crash state.
    val dir = Files.createTempDirectory("mirror-kill1").toString + "/m"
    val base = Seq((1L, 1L, ts(1), "seed", 1.0, "I", 0L),
      (2L, 2L, ts(1), "old", 2.0, "I", 1L),
      (9L, 3L, ts(1), "old", 9.0, "I", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    base.write.partitionBy("part").parquet(dir)
    val drain = Seq((2L, 10L, ts(10), "del", 0.0, "D", 1L),
      (9L, 11L, ts(10), "del", 0.0, "D", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    val boom = intercept[RuntimeException] {
      Sinks.compactMirror(spark, dir, drain, partCol = "part",
        faultPoint = p => if (p == "post-data-write")
          throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage == "injected crash")
    // the window: no manifest yet, so part=1's stale files ARE visible
    assert(Sinks.droppedPartitions(spark, dir).isEmpty)
    assert(Sinks.readMirror(spark, dir, "part")
      .select($"user_id").as[Long].collect().toSet == Set(1L, 2L, 9L))
    // batch retry is the recovery
    Sinks.compactMirror(spark, dir, drain, partCol = "part")
    assert(Sinks.droppedPartitions(spark, dir) == Set("1"))
    assert(Sinks.readMirror(spark, dir, "part")
      .select($"user_id").as[Long].collect().toSet == Set(1L))
  }

  test("kill point between data write and manifest write: revive retry converges") {
    val dir = Files.createTempDirectory("mirror-kill2").toString + "/m"
    val base = Seq((1L, 1L, ts(1), "seed", 1.0, "I", 0L),
      (2L, 2L, ts(1), "old", 2.0, "I", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    base.write.partitionBy("part").parquet(dir)
    val drain = Seq((2L, 10L, ts(10), "del", 0.0, "D", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    Sinks.compactMirror(spark, dir, drain, partCol = "part")
    assert(Sinks.droppedPartitions(spark, dir) == Set("1"))
    // revive crashes after writing part=1's new data, before un-dropping
    val revive = Seq((7L, 20L, ts(20), "new", 7.0, "I", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    intercept[RuntimeException] {
      Sinks.compactMirror(spark, dir, revive, partCol = "part",
        faultPoint = p => if (p == "post-data-write")
          throw new RuntimeException("injected crash"))
    }
    // the window in the OTHER direction: the re-inserted row is on disk
    // but still hidden behind the manifest entry
    assert(Sinks.droppedPartitions(spark, dir) == Set("1"))
    assert(Sinks.readMirror(spark, dir, "part")
      .select($"user_id").as[Long].collect().toSet == Set(1L))
    // batch retry converges: the partition folds from EMPTY again (the
    // crashed write's content is simply rewritten) and un-drops
    Sinks.compactMirror(spark, dir, revive, partCol = "part")
    assert(Sinks.droppedPartitions(spark, dir).isEmpty)
    assert(Sinks.readMirror(spark, dir, "part")
      .select($"user_id", $"part".cast("long")).as[(Long, Long)]
      .collect().toSet == Set((1L, 0L), (7L, 1L)))
  }

  test("manifest write is atomic: an incomplete newer version is never read") {
    // r8 advisory (medium): the old delete-then-overwrite manifest
    // could crash mid-write and lose EVERY drop, resurrecting all
    // previously dropped partitions. Versioned last-wins: a version
    // directory without the committer's _SUCCESS marker is invisible
    // to readers, and the next writer allocates PAST it.
    val dir = Files.createTempDirectory("mirror-atomic").toString + "/m"
    val base = Seq((1L, 1L, ts(1), "seed", 1.0, "I", 0L),
      (2L, 2L, ts(1), "old", 2.0, "I", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    base.write.partitionBy("part").parquet(dir)
    val drain = Seq((2L, 10L, ts(10), "del", 0.0, "D", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    Sinks.compactMirror(spark, dir, drain, partCol = "part")
    assert(Sinks.droppedPartitions(spark, dir) == Set("1"))
    // simulate a writer that crashed mid-manifest-write: a partial
    // version directory with data but no _SUCCESS marker
    val manifestDir = java.nio.file.Paths.get(dir, Sinks.DeletionManifestDir)
    val partial = manifestDir.resolve("v000000099")
    Files.createDirectories(partial)
    Files.writeString(partial.resolve("part-00000.parquet"), "torn write")
    assert(Sinks.droppedPartitions(spark, dir) == Set("1"),
      "an uncommitted manifest version must be invisible")
    // the next manifest write allocates past the crashed version and
    // commits; the old complete version is pruned
    val revive = Seq((7L, 20L, ts(20), "new", 7.0, "I", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    Sinks.compactMirror(spark, dir, revive, partCol = "part")
    assert(Sinks.droppedPartitions(spark, dir).isEmpty)
    import scala.jdk.CollectionConverters._
    val versions = Files.list(manifestDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("v")).toSet
    assert(versions.contains("v000000100") && !versions.contains("v000000001"),
      s"expected post-crash allocation + pruning, got $versions")
  }

  test("a 10k-entry manifest reads through a bounded anti join, same results") {
    // r8 verdict item 4: a long-lived mirror accumulates drops; the
    // reader must not inline 10^4 literals into every plan. Build the
    // manifest at the on-disk contract (one committed version dir).
    val dir = Files.createTempDirectory("mirror-bigmanifest").toString + "/m"
    val base = Seq((1L, 1L, ts(1), "seed", 1.0, "I", 0L),
      (2L, 2L, ts(1), "old", 2.0, "I", 1L),
      (3L, 3L, ts(1), "old", 3.0, "I", 2L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    base.write.partitionBy("part").parquet(dir)
    val entries = ("1" +: (1 to 9999).map(i => s"bogus_$i")).toDF("part_value")
    entries.coalesce(1).write.parquet(
      s"$dir/${Sinks.DeletionManifestDir}/v000000001")
    assert(Sinks.droppedPartitions(spark, dir).size == 10000)
    val live = Sinks.readMirror(spark, dir, "part")
    assert(live.select($"user_id").as[Long].collect().toSet == Set(1L, 3L))
    val plan = live.queryExecution.executedPlan.toString
    assert(!plan.contains("bogus_5000"),
      "10k manifest values must not inline as literals")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti join, got:\n$plan")
  }

  test("a re-insert into a dropped partition un-drops it without resurrection") {
    val dir = Files.createTempDirectory("mirror3").toString + "/m"
    val base = Seq((1L, 1L, ts(1), "seed", 1.0, "I", 0L),
      (2L, 2L, ts(1), "old", 2.0, "I", 1L),
      (9L, 3L, ts(1), "old", 9.0, "I", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    base.write.partitionBy("part").parquet(dir)
    // batch 1 drains part=1 (deletes both keys)
    val drain = Seq((2L, 10L, ts(10), "del", 0.0, "D", 1L),
      (9L, 11L, ts(10), "del", 0.0, "D", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    Sinks.compactMirror(spark, dir, drain, partCol = "part")
    assert(Sinks.droppedPartitions(spark, dir) == Set("1"))
    // batch 2 re-inserts ONE key into part=1: the partition must come
    // back with exactly that key — the pre-drop keys 2 and 9 must NOT
    // resurrect from the stale files
    val revive = Seq((7L, 20L, ts(20), "new", 7.0, "I", 1L)).toDF(
      "user_id", "event_id", "ts", "event_type", "value", "action", "part")
    Sinks.compactMirror(spark, dir, revive, partCol = "part")
    assert(Sinks.droppedPartitions(spark, dir).isEmpty)
    val live = Sinks.readMirror(spark, dir, "part")
      .select($"user_id", $"part".cast("long")).as[(Long, Long)]
      .collect().toSet
    assert(live == Set((1L, 0L), (7L, 1L)))
  }

  test("manifest commits even with marksuccessfuljobs=false (no committer _SUCCESS)") {
    // advisory r9 (medium): with the committer's _SUCCESS suppressed —
    // a common production setting — every manifest version used to be
    // invisible to droppedPartitions, silently resurrecting all dropped
    // partitions. The marker is now OUR contract, created explicitly.
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val prev = hconf.get(key)
    hconf.set(key, "false")
    try {
      val dir = Files.createTempDirectory("mirror-nosuccess").toString + "/m"
      val base = Seq((1L, 1L, ts(1), "seed", 1.0, "I", 0L),
        (2L, 2L, ts(1), "old", 2.0, "I", 1L)).toDF(
        "user_id", "event_id", "ts", "event_type", "value", "action", "part")
      base.write.partitionBy("part").parquet(dir)
      // sanity: the suppression is live — the mirror itself has no marker
      assert(!Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS")),
        "test precondition: committer _SUCCESS suppressed")
      val drain = Seq((2L, 10L, ts(10), "del", 0.0, "D", 1L)).toDF(
        "user_id", "event_id", "ts", "event_type", "value", "action", "part")
      Sinks.compactMirror(spark, dir, drain, partCol = "part")
      assert(Sinks.droppedPartitions(spark, dir) == Set("1"),
        "manifest version must read as complete without committer markers")
      val live = Sinks.readMirror(spark, dir, "part")
        .select($"user_id").as[Long].collect().toSet
      assert(live == Set(1L))
      // and a second write still prunes the first version (the prune is
      // gated on the new version reading back as complete)
      val revive = Seq((7L, 20L, ts(20), "new", 7.0, "I", 1L)).toDF(
        "user_id", "event_id", "ts", "event_type", "value", "action", "part")
      Sinks.compactMirror(spark, dir, revive, partCol = "part")
      assert(Sinks.droppedPartitions(spark, dir).isEmpty)
      import scala.jdk.CollectionConverters._
      val versions = Files.list(java.nio.file.Paths.get(
          dir, Sinks.DeletionManifestDir)).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("v")).toSet
      assert(versions == Set("v000000002"),
        s"old complete version must be pruned, got $versions")
    } finally {
      if (prev == null) hconf.unset(key) else hconf.set(key, prev)
    }
  }
}

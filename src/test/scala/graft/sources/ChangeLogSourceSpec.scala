package graft.sources

import scala.util.Random

import graft.SparkSpec
import graft.model.EventGroups
import graft.sources.ChangeLogSource.{OffsetRange, planRanges, splitRange}

/** Offset bookkeeping properties — the coordinator contract
  * (reference `CoordinatorRunnable.java:84-94`): ranges are gap-free,
  * overlap-free, and cover exactly `(initialMax, finalMax]`. */
class ChangeLogSourceSpec extends SparkSpec {

  test("planRanges: gap-free, overlap-free, covering (100 random runs)") {
    val rnd = new Random(42)
    for (_ <- 1 to 100) {
      val init = rnd.nextInt(1000).toLong
      val observed = Iterator.iterate(init)(_ + rnd.between(-5L, 50L))
        .drop(1).take(20).toList
      val ranges = planRanges(init, observed)
      // contiguous: each range starts where the previous ended
      val end = ranges.foldLeft(init) { (prev, r) =>
        assert(r.min == prev, s"gap/overlap at $r (prev end $prev)")
        assert(r.max > r.min, s"empty or inverted range $r")
        r.max
      }
      // covering: final end == running max of observations
      assert(end == (init +: observed).max)
    }
  }

  test("planRanges ignores regressions and repeats") {
    assert(planRanges(10, Seq(10, 9, 10)) == Seq.empty)
    assert(planRanges(10, Seq(12, 12, 11, 15)) ==
      Seq(OffsetRange(10, 12), OffsetRange(12, 15)))
  }

  test("splitRange partitions a range without gaps (100 random runs)") {
    val rnd = new Random(7)
    for (_ <- 1 to 100) {
      val lo = rnd.nextInt(100).toLong
      val width = rnd.between(1L, 1000L)
      val n = rnd.between(1, 40)
      val parts = splitRange(OffsetRange(lo, lo + width), n)
      assert(parts.size == math.min(n.toLong, width))
      parts.foldLeft(lo) { (prev, r) => assert(r.min == prev); r.max }
      assert(parts.last.max == lo + width)
    }
  }

  test("rangeScan applies half-open (min, max] and IN-list semantics") {
    import spark.implicits._
    val log = Seq(
      (1L, "click", 1.0), (2L, "purchase", 2.0), (3L, "error", 3.0),
      (4L, "click", 4.0), (5L, "view", 5.0))
      .toDF("event_id", "event_type", "value")
    val got = ChangeLogSource
      .rangeScan(log, OffsetRange(1, 4), EventGroups.First)
      .select("event_id").as[Long].collect().sorted
    // event 1 excluded (min is exclusive), 4 included (max inclusive),
    // 2 excluded (purchase = group "second"), 3 excluded (error)
    assert(got.toSeq == Seq(4L))
  }

  test("latestOffset returns max over tracked streams only") {
    import spark.implicits._
    val log = Seq((1L, "click"), (9L, "purchase"), (5L, "view"))
      .toDF("event_id", "event_type")
    val got = ChangeLogSource.latestOffset(log, EventGroups.First)
      .as[Long].head()
    assert(got == 5L)
  }

  test("schema evolution: old and new changelog segments read together") {
    import spark.implicits._
    // a CDC landing zone gains a column mid-stream; the batch reader
    // must union old + new segments with nulls for the missing column
    val dir = java.nio.file.Files.createTempDirectory("evo").toString
    Seq((1L, "click", 1.0)).toDF("event_id", "event_type", "value")
      .write.parquet(s"$dir/seg0")
    Seq((2L, "click", 2.0, "eu-west"))
      .toDF("event_id", "event_type", "value", "region")
      .write.parquet(s"$dir/seg1")
    val merged = spark.read.option("mergeSchema", true)
      .parquet(s"$dir/seg0", s"$dir/seg1")
    assert(merged.columns.toSet ==
      Set("event_id", "event_type", "value", "region"))
    val rows = merged.orderBy("event_id")
      .select($"event_id", $"region").as[(Long, Option[String])]
      .collect().toSeq
    assert(rows == Seq((1L, None), (2L, Some("eu-west"))))
    // downstream operators keep working over the evolved union
    val wm = graft.operators.CdcOps.distinctTxids(
      merged.withColumnRenamed("event_id", "user_id")).count()
    assert(wm == 2L)
  }
}

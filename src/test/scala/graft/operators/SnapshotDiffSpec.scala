package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("snapshotDiff classifies I/U/D with correct payload sides") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("user_id", "tag", "value")
    val after = Seq((2L, "b", 20.0), (3L, "c2", 30.0), (4L, "d", 40.0))
      .toDF("user_id", "tag", "value")
    val d = CdcOps.snapshotDiff(before, after)
      .as[(Long, String, String, Double)].collect().toSet
    assert(d == Set(
      (1L, "D", "a", 10.0),   // deleted: before payload
      (3L, "U", "c2", 30.0),  // updated: after payload
      (4L, "I", "d", 40.0)))  // inserted: after payload
  }

  test("snapshotDiff is null-safe per column") {
    val before = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("user_id", "tag")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("user_id", "tag")
    val d = CdcOps.snapshotDiff(before, after)
      .select($"user_id", $"diff_action").as[(Long, String)].collect().toSet
    // key 1: null == null -> unchanged; key 2: x -> null is an update
    assert(d == Set((2L, "U")))
  }

  test("law: applyDiff(m1, snapshotDiff(m1, m2)) == m2") {
    def ts(d: Int) = new java.sql.Timestamp(d * 86400000L)
    // synthetic action log: I/U/D per event type, like the query
    val ev = (1L to 400L).map { i =>
      val action = (i % 7) match {
        case 0 | 1 => "I"
        case 6     => "D"
        case _     => "U"
      }
      (i, ts((i % 40).toInt), i % 23, s"t${i % 3}", i * 1.5, action)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "action")
    val m1 = CdcOps.snapshotAsOfWithActions(ev, lit(ts(13)))
    val m2 = CdcOps.snapshotAsOfWithActions(ev, lit(ts(31)))
    val replayed = CdcOps.applyDiff(m1, CdcOps.snapshotDiff(m1, m2))
    assert(rows(replayed.select(m2.columns.map(col): _*)) == rows(m2))
    assert(m2.count() > 0)
  }

  test("mergeIntervals: overlap, touch, gap, per-key isolation") {
    val iv = Seq(
      // user 1: [0,10) overlaps [5,15), touches [15,20) -> one span
      (1L, 0L, 10L, 1L), (1L, 5L, 15L, 2L), (1L, 15L, 20L, 3L),
      // user 1: gap then [25,30) -> second span
      (1L, 25L, 30L, 4L),
      // user 2: nested interval [2,3) inside [1,9)
      (2L, 1L, 9L, 5L), (2L, 2L, 3L, 6L)
    ).toDF("user_id", "start_us", "end_us", "event_id")
    val got = CdcOps.mergeIntervals(iv, "user_id", "start_us", "end_us",
        "event_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 20L, 3L), (1L, 25L, 30L, 1L), (2L, 1L, 9L, 2L)))
  }
}

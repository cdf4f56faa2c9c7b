package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaintenanceAndProfileSpec extends SparkSpec {
  import spark.implicits._

  test("joinViewDelta law holds even with late event times in the base") {
    // key 1: base row has a LATER ts than its delta row — an
    // event-time fold would keep the base row and break maintenance;
    // the arrival-order (offset) fold must take the delta row
    val log = Seq(
      (1L, 10L, "2024-01-30 00:00:00", "a"), // base, late ts
      (2L, 11L, "2024-01-02 00:00:00", "b"), // base, untouched by delta
      (1L, 20L, "2024-01-05 00:00:00", "c"), // delta overwrites key 1
      (3L, 21L, "2024-01-06 00:00:00", "d")  // delta inserts key 3
    ).toDF("user_id", "event_id", "ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val dim = Seq((1L, 100L), (2L, 200L), (3L, 300L))
      .toDF("user_id", "first_seen_us")
    val got = CdcOps.joinViewDelta(log, dim, offset1 = 15L, offset2 = 30L)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("first_seen_us"))
      .as[(Long, Long, String, Long)].collect().toSet
    // direct view at offset 30: latest row PER KEY BY OFFSET
    assert(got == Set(
      (1L, 20L, "c", 100L), // delta won despite the base row's later ts
      (2L, 11L, "b", 200L),
      (3L, 21L, "d", 300L)))
  }

  test("joinViewDelta with an empty delta is the base view") {
    val log = Seq((1L, 10L, "a"), (2L, 11L, "b"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val dim = Seq((1L, 1L), (2L, 2L)).toDF("user_id", "d")
    val got = CdcOps.joinViewDelta(log, dim, 20L, 20L)
      .select(col("user_id"), col("event_id")).as[(Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
  }

  test("hotKeyProfile: exact counts, skew factor, top-k order") {
    // 10 rows: key 7 x6, key 1 x3, key 2 x1 -> 3 keys, mean 10/3
    val df = (Seq.fill(6)(7L) ++ Seq.fill(3)(1L) ++ Seq(2L))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("row_id", "k")
    val got = Relational.hotKeyProfile(df, "k", topK = 2)
      .select(col("key"), col("cnt"), col("skew"), col("n_keys"),
        col("n_rows"))
      .as[(Long, Long, Double, Long, Long)].collect().toList
    assert(got == List(
      (7L, 6L, 6.0 * 3 / 10, 3L, 10L),
      (1L, 3L, 3.0 * 3 / 10, 3L, 10L)))
  }

  test("hotKeyProfile plans the top-k as TakeOrdered, not a full sort") {
    val df = spark.range(1000).select(pmod(col("id"), lit(50L)).as("k"))
    val p = Relational.hotKeyProfile(df, "k", topK = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrdered"), p)
  }

  test("windowRankFunctions: peer ties rank identically; ntile balanced") {
    val li = Seq(
      // one order, quantities with a tie on 5
      (1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 7.0), (1L, 4L, 9.0)
    ).toDF("l_orderkey", "l_linenumber", "l_quantity")
    val got = Relational.windowRankFunctions(li)
      .select(col("l_linenumber"), col("rnk"), col("drnk"), col("prnk"),
        col("quartile"))
      .as[(Long, Long, Long, Double, Long)].collect().toList
    assert(got == List(
      (1L, 1L, 1L, 0.0, 1L),
      (2L, 1L, 1L, 0.0, 2L), // same rank as its peer, ntile advances
      (3L, 3L, 2L, 2.0 / 3, 3L),
      (4L, 4L, 3L, 1.0, 4L)))
  }
}

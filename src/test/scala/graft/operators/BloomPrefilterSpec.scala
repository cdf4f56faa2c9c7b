package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPrefilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (1L to 2000L).map(i => (i, i % 100))
    .toDF("l_orderkey", "payload")
  private lazy val dim = (1L to 100L).filter(_ % 10 == 0).map(k => Tuple1(k))
    .toDF("o_orderkey")

  test("bloomPrefilterSemiJoin equals the plain semi-join") {
    val got = Sketches.bloomPrefilterSemiJoin(fact, dim,
        "l_orderkey", "o_orderkey")
      .select($"l_orderkey").as[Long].collect().sorted.toSeq
    val want = fact.join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi")
      .select($"l_orderkey").as[Long].collect().sorted.toSeq
    assert(got == want && want.nonEmpty)
  }

  test("exact even when the filter is saturated (false positives)") {
    // mBits=64 with 10 keys * 3 probes sets ~30 of 64 bits: the screen
    // passes many non-members; the closing semi-join must remove all
    val got = Sketches.bloomPrefilterSemiJoin(fact, dim,
        "l_orderkey", "o_orderkey", mBits = 64)
      .select($"l_orderkey").as[Long].collect().sorted.toSeq
    val want = (1L to 2000L).filter(k => k <= 100 && k % 10 == 0)
    assert(got == want)
  }

  test("the Bloom screen sits in the plan and actually prunes") {
    val screened = Sketches.bloomPrefilterSemiJoin(fact, dim,
      "l_orderkey", "o_orderkey")
    val plan = screened.queryExecution.executedPlan.toString
    assert(plan.contains("element_at"), "bloom bit-test filter missing")
    // no false negatives: every true match survives the screen; with
    // 4096 bits and 10 keys false positives are near-impossible here,
    // so the screen alone should already cut 2000 fact rows to ~10
    assert(screened.count() == 10L)
  }

  test("lateness profile pins on-time vs late octaves") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, "a", ts(10L)), (2L, "a", ts(20L)), (3L, "a", ts(15L)),
      (4L, "b", ts(30L)), (5L, "b", ts(25L))
    ).toDF("event_id", "event_type", "ts")
    val got = CdcOps.latenessProfile(ev)
      .as[(String, Long, Long, Long)].collect().toSet
    // late rows: id3 (20s-15s = 5e6 us) and id5 (30s-25s = 5e6 us);
    // bin = length(bin(5000000)) = 23 binary digits
    assert(got == Set(
      ("a", 0L, 2L, 0L), ("a", 23L, 1L, 5000000L),
      ("b", 0L, 1L, 0L), ("b", 23L, 1L, 5000000L)))
  }
}

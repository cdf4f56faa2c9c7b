package graft.operators

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = (1L to 3000L).map(i =>
      (i, s"t${i % 3}", i % (300 * (1 + (i % 3))))) // per-type cardinalities
    .toDF("event_id", "event_type", "user_id")

  test("hllRegisters: registers max-merge across any split") {
    val whole = Sketches.hllRegisters(events)
      .as[(String, Long, Long)].collect().toSet
    val left = Sketches.hllRegisters(events.filter($"event_id" % 2 === 0))
    val right = Sketches.hllRegisters(events.filter($"event_id" % 2 === 1))
    val merged = Sketches.mergeRegisters(left, right, "event_type")
      .as[(String, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("hllRegisters: estimate lands within HLL error bounds") {
    val ids = (1L to 1000L).map(i => (i, "k", i)).toDF("event_id", "event_type", "user_id")
    val regs = Sketches.hllRegisters(ids)
      .as[(String, Long, Long)].collect()
      .map { case (_, b, r) => b -> r }.toMap
    val est = Sketches.estimate(regs)
    // p=6 -> standard error 1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - 1000.0) / 1000.0 < 0.4, s"estimate $est")
  }

  test("hllRegisters: rho is exact on hand-checkable hashes") {
    // register values must be 55 - bitlength(low 54 bits), 55 when zero
    val one = Seq((1L, "k", 42L)).toDF("event_id", "event_type", "user_id")
    val Seq((bucket, reg)) = Sketches.hllRegisters(one)
      .as[(String, Long, Long)].collect().toSeq.map(r => (r._2, r._3))
    val h = graft.functions.H60.hash("42")
    assert(bucket == (h >> 54))
    val rem = h & ((1L << 54) - 1)
    val expected = if (rem == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    assert(reg == expected)
  }
}

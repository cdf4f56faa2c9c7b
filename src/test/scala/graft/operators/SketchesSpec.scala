package graft.operators

import org.apache.spark.sql.functions.floor

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

  test("hllNdvError: integer-lattice estimate matches the float reference") {
    val ids = (1L to 1000L).map(i => (i, "k", i))
      .toDF("event_id", "event_type", "user_id")
    val row = Sketches.hllNdvError(ids)
      .as[(String, Long, Long, Long)].head()
    val (_, exact, est, errPpm) = row
    assert(exact == 1000L)
    // the lattice estimator is the float formula with α quantized to
    // 709/1000 (|Δα|/α < 6e-4) and one truncating division — agree
    // within that envelope
    val regs = Sketches.hllRegisters(ids)
      .as[(String, Long, Long)].collect()
      .map { case (_, b, r) => b -> r }.toMap
    val ref = Sketches.estimate(regs)
    assert(math.abs(est - ref) / ref < 1e-3, s"lattice $est vs float $ref")
    // err_ppm is the sign-split exact ratio of the SAME two numbers
    val expected = (if (est >= exact) 1L else -1L) *
      (math.abs(est - exact) * 1000000L / exact)
    assert(errPpm == expected)
  }

  test("logHistogram: bins merge across splits; quantile bracket holds") {
    val src = events.withColumn("value", ($"user_id" + 1).cast("double"))
    val wholeSet = Sketches.logHistogram(src)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val merged = Sketches.mergeHistograms(
        Sketches.logHistogram(src.filter($"event_id" % 2 === 0)),
        Sketches.logHistogram(src.filter($"event_id" % 2 === 1)),
        "event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(merged == wholeSet)
    // median bracket of one key must contain the exact median lattice value
    val k = wholeSet.filter(_._1 == "t0").toSeq
      .map { case (_, bin, n, lo, hi) => (bin, n, lo, hi) }
    val exact = src.filter($"event_type" === "t0")
      .select(floor($"value" * 1048576.0).cast("long")).as[Long]
      .collect().sorted
    val median = exact((exact.length - 1) / 2)
    val (lo, hi) = Sketches.quantileBracket(k, 0.5)
    assert(median >= lo && median <= hi, s"$median not in [$lo, $hi]")
  }

  test("logHistogram: zero and negative values take signed bins") {
    val df = Seq((1L, "k", -4.0), (2L, "k", 0.0), (3L, "k", 4.0))
      .toDF("event_id", "event_type", "value")
    val got = Sketches.logHistogram(df)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    val q = 4L * 1048576L // 2^22 -> binary length 23
    assert(got.keySet == Set(-23L, 0L, 23L))
    assert(got(23L) == ((1L, q, q)))
    assert(got(-23L) == ((1L, -q, -q)))
    assert(got(0L) == ((1L, 0L, 0L)))
  }

  test("bloomWords: bit_or-merge across splits; membership sound") {
    val docs = (1L to 60L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val whole = Sketches.bloomWords(docs)
      .as[(String, Long, Long)].collect().toSet
    val merged = Sketches.mergeBloom(
        Sketches.bloomWords(docs.filter($"doc_id" <= 30)),
        Sketches.bloomWords(docs.filter($"doc_id" > 30)), "source")
      .as[(String, Long, Long)].collect().toSet
    assert(merged == whole)
    // no false negatives: every inserted id probes positive
    val aWords = whole.filter(_._1 == "a").map(t => t._2 -> t._3).toMap
    assert((2L to 60L by 2).forall(i =>
      Sketches.bloomMightContain(aWords, i.toString)))
    // 30 ids * 3 probes in 1024 bits: absent ids mostly miss
    val misses = (1000L to 1100L).count(i =>
      !Sketches.bloomMightContain(aWords, i.toString))
    assert(misses > 80, s"only $misses misses — filter saturated?")
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

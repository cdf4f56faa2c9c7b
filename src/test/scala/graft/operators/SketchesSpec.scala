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

  test("amsJoinSize matches a BigInt sign-sum reference exactly") {
    // left: keys 1,1,2,3; right: keys 1,2,2,9 -> exact join size =
    // 2·1 + 1·2 = 4
    val l = Seq(1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 2L, 2L, 9L).toDF("k")
    val row = Sketches.amsJoinSize(l, "k", r, "k", nEst = 8)
      .selectExpr("n_estimators", "cast(exact_size as long)",
        "ams_estimate", "err_ppm")
      .as[(Int, Long, Long, Option[Long])].head()
    def sign(j: Int, k: Long): Long =
      1L - 2L * ((graft.functions.H60.hash(s"$k") >> j) & 1L)
    val ref = {
      val xs = (0 until 8).map { j =>
        val za = Seq(1L, 1L, 2L, 3L).map(sign(j, _)).sum
        val zb = Seq(1L, 2L, 2L, 9L).map(sign(j, _)).sum
        BigInt(za) * BigInt(zb)
      }
      val s = xs.sum
      (s.signum * (s.abs / 8)).toLong
    }
    assert(row._1 == 8 && row._2 == 4L)
    assert(row._3 == ref, s"got ${row._3}, reference $ref")
    val expectedPpm = (if (ref >= 4L) 1L else -1L) *
      (math.abs(ref - 4L) * 1000000L / 4L)
    assert(row._4.contains(expectedPpm))
    // empty intersection: exact 0, err undefined (null)
    val disjoint = Sketches.amsJoinSize(l, "k",
        Seq(100L).toDF("k"), "k", nEst = 4)
      .selectExpr("cast(exact_size as long)", "err_ppm")
      .as[(Long, Option[Long])].head()
    assert(disjoint._1 == 0L && disjoint._2.isEmpty)
  }

  test("quantileBounds: brackets enclose the true quantiles, ranks exact") {
    // key "a": values 1..100 (q = v·2^20, bins by log2) — true p50 =
    // 50, p90 = 90, p99 = 99; each reported [lo_q, hi_q] must enclose
    // the true quantile's lattice point and sit in the right octave
    val rows = (1 to 100).map(v => ("a", v.toDouble))
    val df = rows.toDF("event_type", "value")
    val got = Sketches.quantileBounds(df)
      .as[(String, Int, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    def enclose(pct: Int, trueV: Long): Unit = {
      val (_, _, _, lo, hi, n) = got(pct)
      val q = trueV * 1048576L
      assert(n == 100L)
      assert(lo <= q && q <= hi, s"p$pct: [$lo,$hi] misses $q")
    }
    enclose(50, 50L); enclose(90, 90L); enclose(99, 99L)
    // rank convention: p50 of 1..100 -> rank 50 -> value 50 lives in
    // bin len(bin(50·2^20)) = 26; p99 -> 99 -> bin 27
    assert(got(50)._3 == 26L)
    assert(got(99)._3 == 27L)
    // a key with one value: every percentile collapses to that point
    val one = Seq(("b", 7.0)).toDF("event_type", "value")
    val g1 = Sketches.quantileBounds(one)
      .as[(String, Int, Long, Long, Long, Long)].collect()
    assert(g1.length == 3)
    g1.foreach { case (_, _, _, lo, hi, n) =>
      assert(n == 1L && lo == 7L * 1048576L && hi == lo)
    }
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

  test("sampleSumAudit: estimate = sample sum x 100/pct, exact membership") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val rows = (1L to 200L).map(i =>
      (if (i % 2 == 0) "a" else "b", i, rnd.nextInt(1000).toLong - 300L))
    val df = rows.toDF("event_type", "event_id", "q")
    val got = Sketches.sampleSumAudit(df, "event_type", "event_id",
        col("q"), pct = 10)
      .selectExpr("event_type", "n", "n_sampled",
        "cast(exact_sum_q as long)", "cast(est_sum_q as long)", "err_ppm")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // reference membership: the SAME h60 predicate via hashSample
    val sampled = TextOps.hashSample(df, "event_id", 10)
      .select("event_id").as[Long].collect().toSet
    for (g <- Seq("a", "b")) {
      val all = rows.filter(_._1 == g)
      val inS = all.filter(r => sampled(r._2))
      val (n, ns) = (all.size.toLong, inS.size.toLong)
      val exact = all.map(_._3).sum
      val est = inS.map(_._3).sum * 10
      val (_, gn, gns, gexact, gest, gerr) = got(g)
      assert((gn, gns, gexact, gest) == ((n, ns, exact, est)), g)
      val err = BigInt(est - exact).abs * 1000000 / BigInt(exact).abs
      assert(gerr.get == (if (est >= exact) err.toLong else -err.toLong), g)
    }
  }

  test("sampleSumAudit: zero exact sum yields NULL error; pct must divide 100") {
    import org.apache.spark.sql.functions._
    val df = Seq(("a", 1L, 5L), ("a", 2L, -5L))
      .toDF("event_type", "event_id", "q")
    val got = Sketches.sampleSumAudit(df, "event_type", "event_id",
        col("q")).select("err_ppm").as[Option[Long]].head()
    assert(got.isEmpty)
    intercept[IllegalArgumentException](
      Sketches.sampleSumAudit(df, "event_type", "event_id", col("q"),
        pct = 30))
  }
}

package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 12) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("zscoreAnomalies flags only the planted outlier, exact integers") {
    val ev = Seq(
      (1L, 1L, ts(1), 10.0), (2L, 1L, ts(2), 10.0), (3L, 1L, ts(3), 10.0),
      (4L, 1L, ts(4), 10.0), (5L, 1L, ts(5), 100.0),  // z = 2.05 > 1.5
      (6L, 2L, ts(1), 7.0), (7L, 2L, ts(2), 7.0))     // sigma = 0: no flags
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.zscoreAnomalies(ev)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 5L, 100L * 1048576, 5L)))
  }

  test("zscoreAnomalies is exact past the Long q*q envelope") {
    // |value| = 5000 -> q ~ 5.24e9, q^2 ~ 2.7e19 > Long.MaxValue: a
    // Long square would wrap negative and flip flags; decimal squares
    // must keep the verdict identical to BigInt reference arithmetic
    val vals = Seq(5000.0, 5000.0, 5000.0, 5000.0, -5000.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, 1L, ts(i + 1), v)
    }.toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.zscoreAnomalies(ev)
      .as[(Long, Long, Long, Long)].collect().map(_._2).toSeq
    // BigInt reference: flag iff (q*n - s)^2 * 4 > (n*qq - s^2) * 9
    val qs = vals.map(v => BigInt(math.floor(v * 1048576.0).toLong))
    val n = BigInt(qs.size); val s = qs.sum
    val qq = qs.map(q => q * q).sum
    val expect = qs.zipWithIndex.collect {
      case (q, i) if (q * n - s).pow(2) * 4 > (n * qq - s * s) * 9 =>
        (i + 1).toLong
    }
    assert(got == expect && expect.nonEmpty)
  }

  test("ewmaSmooth: exact truncated EWMA incl. partial head windows") {
    val ev = Seq((1L, 1L, ts(1), 1.0), (2L, 1L, ts(2), 2.0),
      (3L, 1L, ts(3), 3.0)).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.ewmaSmooth(ev)
      .select("event_id", "ewma_q20", "n_lags")
      .as[(Long, Long, Long)].collect().toSeq
    val q = 1048576L
    assert(got == Seq(
      (1L, q, 1L),                                     // head: itself
      (2L, (128 * 2 * q + 64 * q) / 192, 2L),
      (3L, (128 * 3 * q + 64 * 2 * q + 32 * q) / 224, 3L)))
  }

  test("ewmaSmooth: negative values truncate toward zero (div ≡ //)") {
    val ev = Seq((1L, 1L, ts(1), -1.0), (2L, 1L, ts(2), 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.ewmaSmooth(ev)
      .select("event_id", "ewma_q20").as[(Long, Long)].collect().toMap
    // num = -67108864, den = 192 -> -349525.33 truncates to -349525
    assert(got(2L) == -349525L && got(1L) == -1048576L)
  }

  test("ewmaSmooth: constant series is a fixed point; lags cap at 8") {
    val ev = (1 to 12).map(i => (i.toLong, 1L, ts(i), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.ewmaSmooth(ev)
      .select("event_id", "ewma_q20", "n_lags")
      .as[(Long, Long, Long)].collect()
    assert(got.forall(_._2 == 5L * 1048576))
    assert(got.filter(_._1 >= 8).forall(_._3 == 8L))
  }

  test("ewmaSmooth matches a Long-reference EWMA on a seeded random series") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      (i.toLong, (i % 5).toLong + 1L, ts(1 + rnd.nextInt(25), rnd.nextInt(24)),
        rnd.nextDouble() * 200.0 - 100.0)
    }
    val got = TimeSeries.ewmaSmooth(
        rows.toDF("event_id", "user_id", "ts", "value"))
      .select("user_id", "event_id", "ewma_q20", "n_lags")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val expect = rows.groupBy(_._2).flatMap { case (u, rs) =>
      val series = rs.sortBy(r => (r._3.getTime, r._1))
        .map(r => r._1 -> math.floor(r._4 * 1048576.0).toLong)
      series.zipWithIndex.map { case ((eid, _), i) =>
        val lags = (0 to math.min(7, i)).map(k => series(i - k)._2)
        val num = lags.zipWithIndex.map { case (q, k) => q << (7 - k) }.sum
        val den = lags.indices.map(k => 1L << (7 - k)).sum
        (u, eid) -> ((num / den, lags.size.toLong)) // Long / truncates = div
      }
    }
    assert(got == expect)
  }

  test("seasonalProfile: arithmetic dow/hour cells, exact shares") {
    // 2024-01-01 is a Monday -> dow 1 under (days+4)%7 with 0=Sunday
    val ev = Seq((1L, 1L, ts(1, 12), 1.0), (2L, 2L, ts(1, 12), 2.0),
      (3L, 1L, ts(2, 3), 4.0)).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.seasonalProfile(ev)
      .selectExpr("dow", "hr", "n", "cast(sum_q20 as long) AS sum_q20",
        "avg_q20m", "share_ppm")  // sum is DECIMAL(38,0) at the edge
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val q = 1048576L
    assert(got == Seq(
      (1L, 12L, 2L, 3 * q, 3 * q * 1000 / 2, 666666L),
      (2L, 3L, 1L, 4 * q, 4 * q * 1000, 333333L)))
  }

  test("seasonalAnomalies flags only the within-cell outlier") {
    // cell (Mon, 12): ten 10s and one 1000 -> z = 3.16 > 3 flags 1000
    // cell (Tue, 3): constant -> zero variance, zero deviation, silent
    val rows = (1 to 10).map(i => (i.toLong, 1L, ts(1, 12), 10.0)) ++
      Seq((11L, 1L, ts(1, 12), 1000.0)) ++
      (12 to 14).map(i => (i.toLong, 2L, ts(2, 3), 7.0))
    val got = TimeSeries.seasonalAnomalies(
        rows.toDF("event_id", "user_id", "ts", "value"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((11L, 1L, 12L, 1000L * 1048576, 11L)))
  }

  test("seasonalAnomalies: a 2-sigma point passes at z=3, flags at z=3/2") {
    val rows = (1 to 4).map(i => (i.toLong, 1L, ts(1, 12), 10.0)) ++
      Seq((5L, 1L, ts(1, 12), 100.0)) // z = 2.05
    val df = rows.toDF("event_id", "user_id", "ts", "value")
    assert(TimeSeries.seasonalAnomalies(df).count() == 0L)
    assert(TimeSeries.seasonalAnomalies(df, zNumer = 3, zDenom = 2)
      .select("event_id").as[Long].collect().toSeq == Seq(5L))
  }

  test("seasonalAnomalies matches a BigInt reference on seeded random data") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { i =>
      (i.toLong, 1L, ts(1 + rnd.nextInt(3), rnd.nextInt(4)),
        rnd.nextDouble() * 8000.0 - 4000.0) // near the lattice envelope
    }
    val got = TimeSeries.seasonalAnomalies(
        rows.toDF("event_id", "user_id", "ts", "value"),
        zNumer = 3, zDenom = 2)
      .select("event_id").as[Long].collect().toSet
    // independent verdict: (q*n - s)^2 * zDen^2 > (n*qq - s^2) * zNum^2
    // in BigInt, cells keyed by the same (day, hour)
    val expect = rows.groupBy(r => (r._3.getTime / 86400000L,
        r._3.getTime / 3600000L % 24)).flatMap { case (_, rs) =>
      val qs = rs.map(r => r._1 -> BigInt(math.floor(r._4 * 1048576.0).toLong))
      val n = BigInt(qs.size); val s = qs.map(_._2).sum
      val qq = qs.map(q => q._2 * q._2).sum
      qs.collect { case (eid, q)
        if (q * n - s).pow(2) * 4 > (n * qq - s * s) * 9 => eid }
    }.toSet
    assert(got == expect && expect.nonEmpty)
  }

  test("saxMotifs groups users by rank-discretized daily shape") {
    // users 1 and 2: rising daily sums over 8 days -> word 11223344;
    // user 3: falling -> 44332211; user 4: only 3 days -> dropped
    val rows =
      (1 to 8).flatMap(d => Seq(
        (d.toLong, 1L, ts(d), d * 10.0),
        (100L + d, 2L, ts(d), d * 7.0),
        (200L + d, 3L, ts(d), (9 - d) * 10.0))) ++
      (1 to 3).map(d => (300L + d, 4L, ts(d), 5.0))
    val ev = rows.toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.saxMotifs(ev)
      .as[(String, Long)].collect().toMap
    assert(got == Map("11223344" -> 2L, "44332211" -> 1L))
  }

  test("saxMotifs sums multiple events per day before discretizing") {
    // day 1 holds two events summing to 35 — between day 4 and day 5
    val ev = Seq(
      (1L, 1L, ts(1, 1), 12.5), (2L, 1L, ts(1, 20), 22.5), // day 1: 35
      (3L, 1L, ts(2), 10.0),
      (4L, 1L, ts(3), 20.0), (5L, 1L, ts(4), 30.0),
      (6L, 1L, ts(5), 40.0), (7L, 1L, ts(6), 50.0),
      (8L, 1L, ts(7), 60.0), (9L, 1L, ts(8), 70.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.saxMotifs(ev).as[(String, Long)].collect().toMap
    // day sums 35,10,20,30,40,50,60,70: sorted -> 10,20,30,35,40,50,60,70
    // buckets   d2:1 d3:1 d4:2 d1:2 d5:3 d6:3 d7:4 d8:4
    assert(got == Map("21123344" -> 1L))
  }

  test("autocorrLag: alternating series hits exactly -1e6 ppm, trend positive") {
    // alternation: every lag-1 product is -(30*2^20)^2, so the ratio
    // is exactly -1 (num = -den term by term)
    val alt = (1 to 6).map(i =>
      (1L, i.toLong, ts(i), if (i % 2 == 1) 0.0 else 10.0))
      .toDF("user_id", "event_id", "ts", "value")
    val gotAlt = TimeSeries.autocorrLag(alt)
      .as[(Long, Long, Long)].collect().toSeq
    assert(gotAlt == Seq((1L, 5L, -1000000L)))
    // linear trend 0..5: devs (6t-15)*2^20 for t=0..5; num = 315*2^40,
    // den = 405*2^40 -> floor(315e6/405) = 777777 (hand-derived)
    val trend = (0 to 5).map(i => (2L, i.toLong + 1, ts(i + 1), i.toDouble))
      .toDF("user_id", "event_id", "ts", "value")
    val gotTrend = TimeSeries.autocorrLag(trend)
      .as[(Long, Long, Long)].collect().toSeq
    assert(gotTrend == Seq((2L, 5L, 777777L)))
  }

  test("autocorrLag: constant series (zero variance) produces no row; lag=2 flips alternation") {
    val const = (1 to 5).map(i => (1L, i.toLong, ts(i), 7.0))
      .toDF("user_id", "event_id", "ts", "value")
    assert(TimeSeries.autocorrLag(const).count() == 0)
    // at lag 2 the alternating series is perfectly self-similar: +1e6
    val alt = (1 to 6).map(i =>
      (2L, i.toLong, ts(i), if (i % 2 == 1) 0.0 else 10.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = TimeSeries.autocorrLag(alt, lag = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 4L, 1000000L)))
  }

  test("levelShifts flags exactly the step edge, full windows only") {
    // step 0 -> 100 at position 5 of 8: the only row with BOTH full
    // windows straddling the jump; |dmean| = 100 > 50
    val step = (1 to 8).map(i =>
      (1L, i.toLong, ts(i), if (i <= 4) 0.0 else 100.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = TimeSeries.levelShifts(step, w = 4,
        kNumer = 50L * 1048576L, kDenom = 1L)
      .select($"event_id").as[Long].collect().toSeq
    assert(got == Seq(5L))
    // same step below the threshold: silent
    val none = TimeSeries.levelShifts(step, w = 4,
      kNumer = 200L * 1048576L, kDenom = 1L)
    assert(none.count() == 0)
    // series shorter than 2w can never have two full windows
    val short = (1 to 7).map(i =>
      (2L, i.toLong, ts(i), if (i <= 3) 0.0 else 100.0))
      .toDF("user_id", "event_id", "ts", "value")
    assert(TimeSeries.levelShifts(short, w = 4,
      kNumer = 1L, kDenom = 1L).count() == 0)
  }

  test("madOutliers: robust to the masking that defeats the z-score") {
    // two equal extremes inflate the variance enough to hide each
    // other from the 1.5-sigma z test; the median/MAD pair (both 0
    // here) still flags both
    val ev = Seq(
      (1L, 1L, 0.0), (1L, 2L, 0.0), (1L, 3L, 0.0),
      (1L, 4L, 1000.0), (1L, 5L, 1000.0))
      .toDF("user_id", "event_id", "value")
    val mad = TimeSeries.madOutliers(ev)
      .select($"event_id").as[Long].collect().toSet
    assert(mad == Set(4L, 5L))
    val z = TimeSeries.zscoreAnomalies(ev)
      .select($"event_id").as[Long].collect().toSet
    assert(z.isEmpty)
    // even-n: values 0,4,6,100 -> med2 = (4+6)*2^20 (median 5 exact on
    // the doubled lattice), mad4 = (2+10)*2^20 (MAD 3); only 100 flags
    val even = Seq((2L, 1L, 0.0), (2L, 2L, 4.0),
      (2L, 3L, 6.0), (2L, 4L, 100.0))
      .toDF("user_id", "event_id", "value")
    val flagged = TimeSeries.madOutliers(even)
      .select($"event_id").as[Long].collect().toSet
    assert(flagged == Set(4L))
  }

  test("gapFillLocf: carried values, staleness, pre-history nulls, dup ties") {
    def mts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val us = 60000000L
    // user 1: obs at t=10 (v=2) and t=130 (v=5); two same-instant obs
    // at t=130 — event 21 (v=5) must beat event 20 (v=7)? no: HIGHEST
    // event id wins, so 21 (v=5) wins over 20 (v=7)
    val ev = Seq(
      (10L, 1L, mts(10), 2.0),
      (20L, 1L, mts(130), 7.0), (21L, 1L, mts(130), 5.0),
      (30L, 2L, mts(500), 1.0)) // user 2: outside the grid entirely
      .toDF("event_id", "user_id", "ts", "value")
    // grid: 4 hourly points from t=0
    val got = TimeSeries.gapFillLocf(ev, startUs = 0L, points = 4,
        stepUs = 60L * us)
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    val q2 = 2L * 1048576L; val q5 = 5L * 1048576L
    assert(got == Seq(
      (1L, 0L, None, None, None),
      (1L, 60L * us, Some(q2), Some(10L), Some(50L * us)),
      (1L, 120L * us, Some(q2), Some(10L), Some(110L * us)),
      (1L, 180L * us, Some(q5), Some(21L), Some(50L * us)),
      (2L, 0L, None, None, None),
      (2L, 60L * us, None, None, None),
      (2L, 120L * us, None, None, None),
      (2L, 180L * us, None, None, None)))
  }

  test("cusumChangepoints: rate step pins the peak at the step minute") {
    def mts(min: Int) = new java.sql.Timestamp(min * 60000L)
    // type A: 1 event/min for minutes 0-9, then 5/min for 10-19.
    // n=20, tot=60; |S_k| = |20·pre_k − 60k| peaks at k=10 (the last
    // low-rate minute, minute 9): 20·10 − 600 = −400.
    val a = (0 until 10).map(m => ("A", mts(m))) ++
      (10 until 20).flatMap(m => Seq.fill(5)(("A", mts(m))))
    // type B: constant rate -> S_k = 0 everywhere -> tie -> earliest
    val b = (0 until 8).map(m => ("B", mts(m)))
    val df = (a ++ b).toDF("event_type", "ts")
    val got = TimeSeries.cusumChangepoints(df)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 9L * 60000000L, 400L, 20L, 60L)))
    assert(got("B") == (("B", 0L, 0L, 8L, 8L)))
  }

  test("seriesKnn: twins at dist 0, banding prunes the inverted series") {
    // planted words (8 days, 4 buckets, 2 segments of 4):
    //   10, 11 -> "11223344" (twins: identical rank order)
    //   13     -> "11223434" (shares segment "1122" with 10; dist 2)
    //   12     -> "44332211" (inverted: NO shared segment -> pruned)
    //   20, 21 -> "22334411" (twins; disjoint segments from all above)
    def series(uid: Long, sums: Seq[Double]) =
      sums.zipWithIndex.map { case (v, i) => (uid, ts(i + 1), v) }
    val ev = (
      series(10L, Seq(1, 2, 3, 4, 5, 6, 7, 8)) ++
      series(11L, Seq(10, 20, 30, 40, 50, 60, 70, 80)) ++
      series(13L, Seq(1, 2, 3, 4, 5, 7, 6, 8)) ++
      series(12L, Seq(8, 7, 6, 5, 4, 3, 2, 1)) ++
      series(20L, Seq(3, 4, 5, 6, 7, 8, 1, 2)) ++
      series(21L, Seq(30, 40, 50, 60, 70, 80, 10, 20)))
      .toDF("user_id", "ts", "value")
    val got = TimeSeries.seriesKnn(ev,
        org.apache.spark.sql.functions.col("user_id") % 10 === 0, k = 5)
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).map { case (u, rs) =>
        u -> rs.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq
      }
    // query 10: twin first at dist 0, the near-word second at dist 2;
    // the inverted user 12 never appears (banding pruned it) and the
    // disjoint-segment pair 20/21 never meets 10
    assert(got(10L) == Seq((1, 11L, 0L), (2, 13L, 2L)), s"$got")
    assert(got(20L) == Seq((1, 21L, 0L)), s"$got")
    assert(!got.values.flatten.exists(_._2 == 12L))
  }
}

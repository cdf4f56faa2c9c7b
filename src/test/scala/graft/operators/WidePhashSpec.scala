package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The multi-word pHash path (r10 verdict item 1): width no longer
  * saturates at the single-long 60-bit h60 budget, so the hot-bucket
  * guard stops being the recall bound past ~2.1M documents. */
class WidePhashSpec extends SparkSpec {
  import spark.implicits._

  test("wideLayout packs whole bands into 60-bit words") {
    // (bits, bands) -> (bandBits, bandsPerWord, nWords)
    assert(Multimodal.wideLayout(24, 4) == ((6, 10, 1)))
    assert(Multimodal.wideLayout(60, 4) == ((15, 4, 1)))
    assert(Multimodal.wideLayout(64, 4) == ((16, 3, 2)))
    assert(Multimodal.wideLayout(120, 4) == ((30, 2, 2)))
    assert(Multimodal.wideLayout(240, 4) == ((60, 1, 4)))
    assert(Multimodal.wideLayout(96, 3) == ((32, 1, 3)))
    intercept[IllegalArgumentException](Multimodal.wideLayout(244, 4))
    intercept[IllegalArgumentException](Multimodal.wideLayout(25, 4))
  }

  test("adaptivePhashBitsWide keeps occupancy constant past the 60-bit cliff") {
    // the old cap: adaptivePhashBits pins at 60 (15 bits/band) past
    // n ~ 2.1M, after which occupancy grows linearly again
    assert(Multimodal.adaptivePhashBits(10000000L) == 60)
    val occOld = 10000000.0 / (1L << (60 / 4))
    assert(occOld > 64.0, s"old cap already over target at 10M: $occOld")
    // the wide formula keeps tracking ceil(log2(n/64)) per band out to
    // targetBucketSize * 2^maxBandBits ~ 68.7B documents
    for (n <- Seq(10000L, 2000000L, 10000000L, 100000000L, 1000000000L,
                  10000000000L, 60000000000L)) {
      val bandBits = Multimodal.adaptivePhashBitsWide(n) / 4
      val occ = n.toDouble / (1L << bandBits)
      assert(occ <= 64.0 && occ > 16.0,
        s"n=$n bandBits=$bandBits occ=$occ — width must not cap")
    }
    // small-corpus floor unchanged (24 bits total at 4 bands)
    assert(Multimodal.adaptivePhashBitsWide(0L) == 24)
    assert(Multimodal.adaptivePhashBitsWide(500L) == 24)
    // agreement with the narrow formula everywhere the budget allows
    for (n <- Seq(500L, 5000L, 100000L, 500000L, 2000000L))
      assert(Multimodal.adaptivePhashBitsWide(n) ==
        Multimodal.adaptivePhashBits(n), s"n=$n")
    // only past 69B does maxBandBits=30 bind (the documented ceiling)
    assert(Multimodal.adaptivePhashBitsWide(Long.MaxValue / 2) == 120)
  }

  test("wide path at <=60 bits is bit-identical to the narrow path") {
    val m = Multimodal.asMedia(
      Seq((1L, "same payload bytes"), (2L, "same payload bytes"),
        (3L, "a completely different payload"), (4L, "same payload bytes"),
        (5L, "yet another distinct doc")).toDF("doc_id", "text"),
      "doc_id", $"text".cast("binary"), "image")
    val narrow = Multimodal.phashNearDupPairs(m, bits = 24)
      .as[(Long, Long, Long)].collect().toSet
    val wide = Multimodal.phashNearDupPairsWide(m, bits = 24)
      .as[(Long, Long, Long)].collect().toSet
    assert(wide == narrow, s"wide=$wide narrow=$narrow")
  }

  test("120-bit wide pairs: identical payloads at hamming 0, guard + stats hold") {
    val rows = (1L to 40L).map(i => (i, "the same bytes every time")) ++
      Seq((100L, "distinct payload one"), (200L, "distinct payload two"),
        (300L, "distinct payload one")) // one planted dup pair
    val m = Multimodal.asMedia(rows.toDF("doc_id", "text"),
      "doc_id", $"text".cast("binary"), "image")
    val pairs = Multimodal.phashNearDupPairsWide(m, bits = 120)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    // 40 identical + the planted (100, 300) pair, all at distance 0
    assert(pairs((100L, 300L)) == 0L)
    assert(pairs.size == 40 * 39 / 2 + 1, s"${pairs.size}")
    assert(pairs.values.forall(_ == 0L))
    // the guard drops the 40-doc bucket whole at wide widths too
    val guarded = Multimodal.phashNearDupPairsWide(m, bits = 120,
        maxBucket = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(guarded == Seq((100L, 300L, 0L)), s"$guarded")
    // loud accounting at the wide width: per band, one 40-doc hot
    // bucket, 40 dropped document-slots
    val stats = Multimodal.phashBucketStatsWide(m, bits = 120, maxBucket = 8)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(stats.map(_._1) == Seq(0, 1, 2, 3))
    assert(stats.forall { case (_, nd, _, mx, hot, drop) =>
      nd == 43L && mx == 40L && hot == 1L && drop == 40L })
    // 30-bit bands separate the distinct docs (no false candidates)
    assert(!pairs.contains((100L, 200L)) && !pairs.contains((200L, 300L)))
  }

  test("wide hash words reuse the narrow stub's global bit salts") {
    // word 0 of any wide hash == phashStub at the same width whenever
    // the width fits one word: the differential anchor that keeps the
    // DuckDB oracle form identical across narrow and wide
    val df = Seq((1L, "payload a"), (2L, "payload b"), (3L, "payload a"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val narrow = df.select(Multimodal.phashStub($"payload", 60))
      .as[Long].collect().toSeq
    // bandedPhashWide at 60 bits / 4 bands carries phs = [word0]
    val m = Multimodal.asMedia(
      Seq((1L, "payload a"), (2L, "payload b"), (3L, "payload a"))
        .toDF("doc_id", "text"),
      "doc_id", $"text".cast("binary"), "image")
    val wide = Multimodal.phashNearDupPairsWide(m, bits = 60)
    // identical payloads 1 and 3 pair at 0 under both
    assert(wide.as[(Long, Long, Long)].collect().toSeq ==
      Seq((1L, 3L, 0L)))
    assert(narrow(0) == narrow(2) && narrow(0) != narrow(1))
  }
}

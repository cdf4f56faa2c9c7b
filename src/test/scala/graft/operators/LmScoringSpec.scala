package graft.operators

import graft.SparkSpec

/** Bigram cross-entropy scoring and PMI collocation mining. */
class LmScoringSpec extends SparkSpec {
  import spark.implicits._

  // ---- bigramSurprisal ----

  test("bigramSurprisal: hand-computed bits on a tiny corpus") {
    // corpus bigrams: (a,b) x2 (doc1), (a,c) x1 (doc2)
    //   c(a,b)=2, c(a,c)=1, c_w1(a)=3
    // doc1: bigram (a,b) twice -> bits = floorlog2(3 div 2) = 0 each
    // doc2: bigram (a,c) once  -> bits = floorlog2(3 div 1) = 1
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: (a,b), (b,a), (a,b)
      (2L, "a c"))
      .toDF("doc_id", "text")
    // recompute doc1 exactly: bigrams (a,b),(b,a),(a,b)
    //   c(a,b)=2, c(b,a)=1, c(a,c)=1; c_w1(a)=3, c_w1(b)=1
    //   doc1 bits: (a,b): 3 div 2 = 1 -> 0 bits, twice;
    //              (b,a): 1 div 1 = 1 -> 0 bits
    //   doc1: n=3, sum=0, mean=0
    //   doc2 bits: (a,c): 3 div 1 = 3 -> 1 bit; n=1, sum=1, mean ppm=1e6
    val got = TextOps.bigramSurprisal(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 0L, 0L),
      (2L, 1L, 1L, 1000000L)))
  }

  test("bigramSurprisal: predictable docs score below surprising ones") {
    // 9 docs of pure "x y" repetition make (x,y)/(y,x) cheap; the
    // outlier doc pairs x with a once-seen word -> expensive bigram
    val docs = ((1L to 9L).map(i => (i, "x y x y x y")) :+
      (10L, "x q")).toDF("doc_id", "text")
    val rows = TextOps.bigramSurprisal(docs)
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = rows.map(r => r._1 -> r._4).toMap
    assert(byDoc(10L) > byDoc(1L),
      s"rare continuation must cost more bits: $byDoc")
  }

  test("bigramSurprisal: single-token and empty docs produce no row") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b"))
      .toDF("doc_id", "text")
    val ids = TextOps.bigramSurprisal(docs)
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(3L))
  }

  // ---- pmiCollocations ----

  test("pmiCollocations: bound pair beats independent pairs") {
    // "san francisco" always co-occurs; "the" pairs with everything.
    // With minCount=2 the bound pair must surface with higher
    // ratio_floor than any "the"-pair.
    val docs = (1L to 6L).map(i =>
        (i, "san francisco the cat the dog the bird"))
      .toDF("doc_id", "text")
    val got = TextOps.pmiCollocations(docs, minCount = 2, topN = 10)
      .select("w1", "w2", "ratio_floor")
      .as[(String, String, Long)].collect()
    assert(got.nonEmpty)
    val top = got.head
    assert((top._1, top._2) == ("san", "francisco"),
      s"bound pair should rank first: ${got.toSeq}")
    val theRatios = got.filter(r => r._1 == "the" || r._2 == "the")
      .map(_._3)
    assert(theRatios.forall(_ < top._3),
      s"'the' pairs must score below the bound pair: ${got.toSeq}")
  }

  test("pmiCollocations: minCount filters one-off pairs") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta"),
      (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val pairs = TextOps.pmiCollocations(docs, minCount = 2, topN = 10)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(pairs.contains(("alpha", "beta")))
    assert(!pairs.contains(("gamma", "delta")),
      s"c_ab=1 pair must be dropped: $pairs")
  }

  test("pmiCollocations: hand-checked lattice values") {
    // one doc "a b a b": bigrams (a,b)x2, (b,a)x1 -> N=3
    //   (a,b): c_a(left a)=2? left marginal: a as w1 in (a,b)x2 = 2;
    //          b as w2 in (a,b)x2 = 2... right marginal of b = 2
    //   ratio(a,b) = (3*2) div (2*2) = 1 -> pmi_bits 0, floor 1
    //   (b,a): left(b)=1, right(a)=1, ratio = 3*1 div 1 = 3 -> bits 1
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = TextOps.pmiCollocations(docs, minCount = 1, topN = 10)
      .select("w1", "w2", "c_ab", "pmi_bits", "ratio_floor")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("b", "a", 1L, 1L, 3L),
      ("a", "b", 2L, 0L, 1L)))
  }

  // ---- lmScoreHeldout / lmBuckets (CCNet-style filter) ----

  test("lmScoreHeldout: seen/backoff/OOV lattice, hand-computed") {
    // h60(id:ccnet)%100: ids 4,5 train; ids 1,2 held (precomputed)
    // train corpus (docs 4, 5): "a b a b" + "a c"
    //   LM bigrams: c(a,b)=2, c(b,a)=1, c(a,c)=1; c_w1(a)=3, c_w1(b)=1
    //   continuation: c_w2(b)=2, c_w2(a)=1, c_w2(c)=1; N=4
    val docs = Seq(
      (4L, "a b a b"), (5L, "a c"),              // train
      (1L, "a b q c"),                            // held
      (2L, "z z"))                                // held, all OOV
      .toDF("doc_id", "text")
    val got = TextOps.lmScoreHeldout(docs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc1 bigrams: (a,b) seen -> floorlog2(3 div 2)=0;
    //   (b,q): q unseen as w2 -> OOV flat 20;
    //   (q,c): unseen bigram, c known as w2 -> floorlog2(4 div 1)+4=6
    //   n=3, sum=26, mean ppm = 26*1e6 div 3 = 8666666
    // doc2: (z,z) OOV -> 20; n=1, sum=20, mean 20e6
    assert(got == Seq(
      (1L, 3L, 26L, 8666666L),
      (2L, 1L, 20L, 20000000L)))
  }

  test("lmBuckets: boundary ppm values land exactly") {
    val scored = Seq(
      (1L, 10L, 10L, 999999L), (2L, 10L, 10L, 1000000L),
      (3L, 10L, 10L, 1999999L), (4L, 10L, 10L, 2000000L))
      .toDF("doc_id", "n_bigrams", "sum_bits", "mean_bits_ppm")
    val got = TextOps.lmBuckets(scored, 1000000L, 2000000L)
      .select($"doc_id", $"bucket").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "head"), (2L, "middle"),
      (3L, "middle"), (4L, "tail")))
    intercept[IllegalArgumentException](
      TextOps.lmBuckets(scored, 5L, 1L))
  }
}

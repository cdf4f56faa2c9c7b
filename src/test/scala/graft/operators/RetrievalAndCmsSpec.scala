package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 retrieval, count-min sketch, SemDeDup, incremental dedup. */
class RetrievalAndCmsSpec extends SparkSpec {
  import spark.implicits._

  // ---- BM25 ----

  test("bm25TopK: exact lattice scores on a hand-computed corpus") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "banana banana banana"))
      .toDF("doc_id", "text")
    // N=3, L=8, df(apple)=2 -> p=2*3-2*2+1=3, q=2*2+1=5, 3 div 5 = 0,
    // w = length(bin(0)) = 1.
    // doc1: tf=2, dl=3: (22*2*8*1e6) div (10*8*2 + 3*8 + 9*3*3)
    //       = 352000000 div 265 = 1328301
    // doc2: tf=1, dl=2: (22*1*8*1e6) div (80 + 24 + 54)
    //       = 176000000 div 158 = 1113924
    val got = TextOps.bm25TopK(docs, Seq("apple"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 1L, 1328301L, 1L),
      (2L, 2L, 1113924L, 1L)))
  }

  test("bm25TopK: rare terms outweigh common ones via the idf lattice") {
    // "zebra" in 1 of 8 docs, "the" in all 8; a doc matching only
    // zebra must outrank a doc matching only the (equal tf, dl)
    val docs = (1L to 6L).map(i => (i, "the filler pad")) ++
      Seq((7L, "zebra filler pad"), (8L, "the filler pad"))
    val got = TextOps.bm25TopK(docs.toDF("doc_id", "text"),
        Seq("zebra", "the"), k = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.head._2 == 7L, s"zebra doc should rank first: ${got.toSeq}")
    // idf weight: zebra p=2*8-2+1=15, q=3 -> 15 div 3 = 5, w=3;
    // the p=2*8-16+1=1, q=15 -> 0, w=1; same tfn => 3x score
    val zebra = got.head._3
    val the = got(1)._3
    assert(zebra == 3L * the, s"w(zebra)=3 vs w(the)=1: $zebra $the")
  }

  test("bm25TopK: length normalization favors the shorter doc at equal tf") {
    val docs = Seq(
      (1L, "term pad"),
      (2L, "term pad pad pad pad pad pad pad"))
      .toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, Seq("term"), k = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
    assert(got(0)._3 > got(1)._3)
  }

  // ---- count-min ----

  test("countMinWords: estimate >= true count for every term (CMS guarantee)") {
    val docs = (1L to 40L).map(i =>
        (i, s"w${i % 7} w${i % 7} w${i % 13} shared"))
      .toDF("doc_id", "text")
    val report = Sketches.cmsHeavyHitters(docs, topN = 1000)
      .as[(String, Long, Long)].collect()
    assert(report.nonEmpty)
    report.foreach { case (term, trueN, estN) =>
      assert(estN >= trueN, s"$term: est $estN < true $trueN")
    }
    // "shared" appears once per doc
    val shared = report.find(_._1 == "shared").get
    assert(shared._2 == 40L)
  }

  test("countMinWords: sketches merge by element-wise sum") {
    val docs = (1L to 30L).map(i => (i, s"a${i % 5} b${i % 3} c"))
      .toDF("doc_id", "text")
    val whole = Sketches.countMinWords(docs)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketches.mergeCountMin(
        Sketches.countMinWords(docs.filter($"doc_id" % 2 === 0)),
        Sketches.countMinWords(docs.filter($"doc_id" % 2 === 1)))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("countMinWords: sketch size is bounded by depth*width") {
    val docs = (1L to 200L).map(i => (i, s"t$i u$i v$i")) // 600 distinct terms
      .toDF("doc_id", "text")
    val n = Sketches.countMinWords(docs, depth = 4, width = 64).count()
    assert(n <= 4L * 64L, s"sketch rows $n exceed depth*width")
  }

  // ---- SemDeDup ----

  test("semDedup: drops within-cluster near-twins, keeps min id") {
    // stride 4 -> centroids are vec_id 0 and 4
    val e = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),  // centroid A
      (1L, Seq(1.0f, 0.0f, 0.0f)),  // identical to 0 -> dropped
      (2L, Seq(0.99f, 0.1f, 0.0f)), // cos>tau vs 0 -> dropped
      (3L, Seq(0.6f, 0.75f, 0.0f)), // cluster A but below tau -> kept
      (4L, Seq(0.0f, 0.0f, 1.0f)),  // centroid B
      (5L, Seq(0.0f, 0.01f, 1.0f)), // near 4 -> dropped
      (6L, Seq(0.0f, 0.7f, 0.72f))) // cluster B, below tau -> kept
      .toDF("vec_id", "embedding")
    val got = Similarity.semDedup(e, tau = 0.95, stride = 4L)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(0L, 3L, 4L, 6L), s"survivors ${got.keySet}")
    assert(got(3L) == 0L && got(6L) == 4L)
  }

  test("semDedup: drop rule is not chained through dropped members") {
    // 1 is within tau of 0; 2 is within tau of 1 but NOT of 0.
    // Both 1 and 2 are dropped (each has a smaller-id near-twin),
    // even though 2's twin is itself dropped — the SemDeDup
    // one-representative-per-ball rule, pinned.
    val a = math.toRadians(0.0); val b = math.toRadians(25.0)
    val c = math.toRadians(50.0) // cos(25deg)=.906 > tau, cos(50)=.64 < tau
    def v(t: Double) = Seq(math.cos(t).toFloat, math.sin(t).toFloat)
    val e = Seq((0L, v(a)), (1L, v(b)), (2L, v(c)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semDedup(e, tau = 0.9, stride = 3L)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(0L), s"got ${got.keySet}")
  }

  // ---- incremental dedup ----

  test("incrementalNearDups: batch screens against corpus, A-cross-B only") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "completely different corpus content about spark and scala"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today"),
      (11L, "novel text that matches nothing in the standing corpus x"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(corpus, batch, threshold = 0.5)
      .as[(Long, Long, Double, Long)].collect()
    // 10 duplicates corpus docs 1 AND 2 (identical): best match is the
    // min id at jaccard 1.0 with two matches; 11 is novel -> no row;
    // the corpus-internal 1~2 duplicate pair must NOT surface
    assert(got.toSeq == Seq((10L, 1L, 1.0, 2L)), s"got ${got.toSeq}")
  }

  test("incrementalNearDups: empty batch yields empty verdicts") {
    val corpus = Seq((1L, "some corpus document text here"))
      .toDF("doc_id", "text")
    val batch = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.incrementalNearDups(corpus, batch).count() == 0L)
  }
}

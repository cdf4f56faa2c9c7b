package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The  quick brown fox jumps over the lazy dog"), // ws/case dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (4L, "completely different words entirely here now today"),
    (5L, "the quick brown fox jumps over the lazy dog"))   // exact dup of 1
    .toDF("doc_id", "text")

  test("exactGroups collapses normalized duplicates, keeps min doc_id") {
    val groups = Dedup.exactGroups(docs)
      .as[(String, Long, Long)].collect()
      .map { case (_, keep, n) => keep -> n }.toMap
    assert(groups(1L) == 3L) // docs 1, 2, 5
    assert(groups(3L) == 1L)
    assert(groups(4L) == 1L)
  }

  test("exactDedup keeps one survivor per content, min doc_id wins") {
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("shingleSets: n-k+1 distinct shingles; short docs fall back whole") {
    val sh = Dedup.shingleSets(docs, k = 3)
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).size == 7) // 9 tokens -> 7 tri-grams
    assert(sh(1L).contains("the quick brown"))
    val short = Dedup.shingleSets(Seq((9L, "just two")).toDF("doc_id", "text"))
      .as[(Long, Seq[String])].collect().toMap
    assert(short(9L) == Seq("just two"))
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("x", "y")))
      .toDF("a", "b", "c")
    val (same, disj) = df.select(
      Dedup.jaccard($"a", $"b"), Dedup.jaccard($"a", $"c"))
      .as[(Double, Double)].head()
    assert(same == 1.0 && disj == 0.0)
  }

  test("ngramJaccardPairs finds the near-dup family above threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    // 1,2,5 identical after normalization -> jaccard 1.0
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 5L)) == 1.0)
    assert(pairs((2L, 5L)) == 1.0)
    // 1 vs 3: 7 trigrams each, only the final one differs -> 6/8
    assert(math.abs(pairs((1L, 3L)) - 0.75) < 1e-12)
    assert(!pairs.contains((1L, 4L)))
  }

  test("ngramJaccardPairs: maxDf drops boilerplate shingles, bounds pairs") {
    // 8 docs all sharing ONE boilerplate trigram ("terms of service"),
    // otherwise pairwise-unique: the uncapped self-join would emit
    // C(8,2)=28 pairs from that single hot key.
    val boiler = (1 to 8)
      .map(i => (100L + i, s"terms of service aa$i bb$i cc$i"))
      .toDF("doc_id", "text")
    // cap below df: the hot shingle is dropped, nothing collides
    val capped = Dedup.ngramJaccardPairs(boiler, threshold = 0.0, maxDf = 7)
    assert(capped.count() == 0L)
    // cap at df: all 28 pairs, jaccard over the 4-shingle sets = 1/7
    val full = Dedup.ngramJaccardPairs(boiler, threshold = 0.1, maxDf = 8)
      .as[(Long, Long, Double)].collect()
    assert(full.length == 28)
    assert(full.forall(p => math.abs(p._3 - 1.0 / 7.0) < 1e-12))
    // the small fixture is unaffected by the default cap (df <= 3)
    val dflt = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(dflt((1L, 2L)) == 1.0)
  }

  test("minhashAccuracy: identical docs estimate exactly 1, errors exact") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg"), (2L, "aa bb cc dd ee ff gg"),
      (3L, "aa bb cc dd ee ff xx yy")) // overlaps 1/2 partially
      .toDF("doc_id", "text")
    val got = Dedup.minhashAccuracy(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // identical pair: all 32 signature positions agree, J exactly 1
    val id = got((1L, 2L))
    assert(id._3 == 32L && id._4 == id._5) // matches=32, inter=uni
    assert(id._6 == 1000000L && id._7 == 1000000L && id._8 == 0L)
    // every pair's err_ppm is exactly the cleared-fraction difference
    got.values.foreach { case (_, _, m, i, u, est, ex, err) =>
      assert(est == m * 1000000L / 32L)
      assert(ex == i * 1000000L / u)
      val d = m * u - 32L * i
      assert(err == d.signum * (math.abs(d) * 1000000L / (32L * u)))
    }
  }

  test("jaccardThresholdSweep: exact buckets and cumulative retention") {
    // the 8-doc boilerplate fixture at maxDf=8: all 28 pairs have
    // J = 1/7 -> bucket (20*1) div 7 = 2; add one exact-dup pair at
    // J = 1 -> bucket 20
    val boiler = (1 to 8)
      .map(i => (100L + i, s"terms of service aa$i bb$i cc$i"))
    val dups = Seq((200L, "xx yy zz ww"), (201L, "xx yy zz ww"))
    val docs9 = (boiler ++ dups).toDF("doc_id", "text")
    val sweep = Dedup.jaccardThresholdSweep(docs9, maxDf = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(sweep == Seq((2L, 28L, 29L), (20L, 1L, 1L)))
  }

  test("minhash LSH finds exact duplicates as candidates and verifies them") {
    val pairs = Dedup.nearDuplicatePairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    // identical docs always collide in every band
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 5L)) == 1.0)
    assert(!pairs.contains((1L, 4L)))
  }

  test("minhash signature: identical inputs agree, length = perms") {
    val sigs = Dedup.shingleSets(docs, 3)
      .select($"doc_id", Dedup.minhashSignature($"sh", 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L).size == 16)
    assert(sigs(1L) == sigs(2L)) // same normalized content
    assert(sigs(1L) != sigs(4L))
  }

  test("simhash64: equal for identical docs, close for near-dups") {
    val fps = Dedup.simhashFp(docs.withColumn("text", lower($"text")))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(5L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fps(1L), fps(3L)) < hamming(fps(1L), fps(4L)))
  }

  test("minhash-union sketch: group signature = elementwise min; estimator sane") {
    import graft.functions.MinHashUnion
    val sh = Dedup.shingleSets(docs, 3)
      .select($"doc_id", Dedup.minhashSignature($"sh", 16).as("sig"))
    val perDoc = sh.as[(Long, Seq[Long])].collect().toMap
    val unioned = sh.agg(MinHashUnion.minhash_union($"sig", 16))
      .as[Seq[Long]].head()
    val expected = perDoc.values.reduce((a, b) =>
      a.zip(b).map { case (x, y) => math.min(x, y) })
    assert(unioned == expected)
    // estimator: identical sketches -> 1.0
    val est = sh.limit(1)
      .select(MinHashUnion.estimatedJaccard($"sig", $"sig"))
      .as[Double].head()
    assert(est == 1.0)
  }

  test("nearDupSurvivors keeps the longest member, min doc_id on ties") {
    val components = Seq((1L, 1L), (2L, 1L), (5L, 1L), (3L, 3L), (7L, 3L))
      .toDF("doc_id", "component")
    val docMeta = Seq((1L, 40L), (2L, 44L), (5L, 44L), (3L, 10L), (7L, 10L))
      .toDF("doc_id", "n_chars")
    val got = Dedup.nearDupSurvivors(components, docMeta)
      .as[(Long, Long, Long)].collect().toSeq
    // component 1: 2 and 5 tie at 44 chars -> min doc_id 2 survives
    // component 3: 3 and 7 tie at 10 chars -> 3 survives
    assert(got == Seq((1L, 2L, 3L), (3L, 3L, 2L)))
  }

  test("fuzzyPairs: edit within prefix pairs, block escape documented") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over it"),
      (2L, "the quick brown fax jumps over it"), // 1 edit, same block
      (3L, "xhe quick brown fox jumps over it"), // edit INSIDE block key
      (4L, "completely different text entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.fuzzyPairs(docs)
      .as[(Long, Long, Int)].collect().toSeq
    // 3 is 1 edit from 1 but its block key differs -> escapes (the
    // standard blocking tradeoff the scaladoc documents)
    assert(got == Seq((1L, 2L, 1)))
  }

  test("fuzzyPairs drops oversized blocks whole") {
    val docs = (1L to 5L).map(i => (i, s"same start here tail$i"))
      .toDF("doc_id", "text")
    assert(Dedup.fuzzyPairs(docs, maxBlock = 4).count() == 0L)
    assert(Dedup.fuzzyPairs(docs, maxBlock = 5).count() > 0L)
  }
}

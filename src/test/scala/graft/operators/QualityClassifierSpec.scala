package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TextOps.hashedGramCounts]] / [[TextOps.hashedQualityWeights]] /
  * [[TextOps.trainQualityLr]] — the fastText/DCLM hashed-ngram quality
  * classifier pair (r13 verdict item 6): the integer-lattice twin is
  * hash-gated in Verify; THIS spec pins the learned variant's accuracy
  * floor and its agreement with the twin (the `sim_ivf_topk`
  * rows-only discipline: what the oracle can't hash, a spec pins). */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Separable corpus: even docs are stopword-bearing English
    * sentences (filterKeep = true), odd docs are stopword-free
    * letter-block runs (stopword ratio 0 → drop). */
  private def corpus(n: Int) =
    (0 until n).map { i =>
      if (i % 2 == 0)
        (i.toLong, s"the quick brown fox number $i jumps over " +
          "the lazy dog and runs far today.")
      else
        (i.toLong, s"zqx$i bbbbcccc ddddeeee ffffgggg hhhhiiii " +
          "jjjjkkkk llllmmmm nnnnoooo")
    }.toDF("doc_id", "text")

  test("hashedGramCounts: unigram+bigram occurrences, buckets bounded") {
    val df = Seq((1L, "aa bb aa"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.hashedGramCounts(df, 16)
    // doc 1 grams: aa, bb, aa + aa_bb, bb_aa = 5; doc 2: 1; doc 3: 0
    val perDoc = got.groupBy($"doc_id").agg(sum($"m").as("t"))
      .as[(Long, Long)].collect().toMap
    assert(perDoc == Map(1L -> 5L, 2L -> 1L))
    assert(got.agg(max($"bucket")).as[Long].head() < 16L)
    assert(got.agg(min($"bucket")).as[Long].head() >= 0L)
  }

  test("deterministic twin: DENSE weight vector, separable held-out accuracy") {
    val docs = corpus(200)
    val w = TextOps.hashedQualityWeights(docs, nBuckets = 256)
    assert(w.count() == 256L) // dense: one row per bucket, the model
    val p = TextOps.hashedQualityPrior(docs)
    val held = docs.filter(
      !TextOps.samplePredicate($"doc_id", 50, "qhsplit"))
    val scored = TextOps.hashedQualityScore(held, w, p, nBuckets = 256)
      .select($"label_keep", $"predicted_keep")
      .as[(Boolean, Boolean)].collect().toSeq
    assert(scored.nonEmpty)
    val acc = scored.count(r => r._1 == r._2).toDouble / scored.size
    assert(acc >= 0.9, s"deterministic twin held-out accuracy $acc")
  }

  test("learned variant: accuracy floor and agreement with the integer twin") {
    val docs = corpus(200)
    val (w0, wv) = TextOps.trainQualityLr(docs, nBuckets = 256,
      epochs = 8)
    assert(wv.length == 256)
    val held = docs.filter(
      !TextOps.samplePredicate($"doc_id", 50, "qhsplit"))
    val lr = TextOps.scoreQualityLr(held, w0, wv, nBuckets = 256)
    val n = lr.count().toDouble
    val acc = lr.filter($"predicted_keep" === $"label_keep")
      .count() / n
    assert(acc >= 0.9, s"learned held-out accuracy $acc")
    val det = TextOps.hashedQualityScore(held,
        TextOps.hashedQualityWeights(docs, nBuckets = 256),
        TextOps.hashedQualityPrior(docs), nBuckets = 256)
      .select($"doc_id", $"predicted_keep".as("det_keep"))
    val agree = lr.join(det, "doc_id")
      .filter($"predicted_keep" === $"det_keep").count() / n
    assert(agree >= 0.85, s"learned-vs-twin agreement $agree")
  }

  test("gram-free documents score prior-only, never drop out") {
    val docs = corpus(40)
      .union(Seq((998L, ""), (999L, "12345 67890")).toDF("doc_id", "text"))
    val w = TextOps.hashedQualityWeights(docs, nBuckets = 64)
    val p = TextOps.hashedQualityPrior(docs)
    val got = TextOps.hashedQualityScore(
        docs.filter($"doc_id" >= 998L), w, p, nBuckets = 64)
      .select($"doc_id", $"n_grams").as[(Long, Long)].collect().toMap
    // "" and digit-only text have zero [a-z]+ word tokens
    assert(got == Map(998L -> 0L, 999L -> 0L))
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Naive-Bayes quality classifier: exact hand-fold of the floor-bit
 * model (counts, smoothing, priors, verdicts) on a clean-vs-gibberish
 * corpus, plus the degenerate edges (token-free docs, the agreement
 * rollup's conservation law).
 */
class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  // even ids: stopword-rich clean English (filterKeep = true);
  // odd ids: gibberish with zero stopwords (ratio 0 -> drop). Both
  // classes share vocabulary within the class across the h60 split.
  private val clean = Vector(
    "the cat sat on the mat and it is a good day",
    "a dog ran in the park and the sun is warm",
    "it is the best of the season and a fine day",
    "the bird sang in a tree and the air is cool")
  private val gibberish = Vector(
    "zxqvk jhgfd wqpzt lkmnb vcxzr tyuio",
    "jhgfd vcxzr zxqvk tyuio wqpzt lkmnb",
    "lkmnb wqpzt tyuio zxqvk jhgfd vcxzr",
    "tyuio lkmnb vcxzr jhgfd zxqvk wqpzt")
  private val docs: Seq[(Long, String)] =
    (1L to 40L).map(i =>
      i -> (if (i % 2 == 0) clean(((i / 2) % 4).toInt)
            else gibberish(((i / 2) % 4).toInt)))

  private val Stop = TextOps.EnglishStopwords.toSet
  private def wtoks(text: String): List[String] =
    "[a-z]+".r.findAllIn(text.toLowerCase).toList
  private def label(text: String): Boolean = {
    val t = wtoks(text)
    val n = math.max(t.size, 1).toDouble
    val avg = t.map(_.length).sum / n
    text.length >= 20 && text.length <= 100000 &&
      avg >= 2.0 && avg <= 12.0 && t.count(Stop) / n > 0.01
  }
  private def isTrain(id: Long): Boolean =
    graft.functions.H60.hash(s"$id:nbsplit") % 100 < 50
  // length(bin(x)) - 1 for x >= 0 (bin(0) = "0" -> 0 bits)
  private def bits(x: Long): Long =
    if (x == 0L) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x)

  /** The whole model, folded by hand in plain Scala. Totals/priors
    * come from the FULL counts; `minCount` caps only the lookup table,
    * exactly as nbTrain specifies. */
  private def handFold(corpus: Seq[(Long, String)], minCount: Long = 1L)
      : Map[Long, (Boolean, Long, Long, Long, Boolean)] = {
    val train = corpus.filter(d => isTrain(d._1))
    val eval = corpus.filterNot(d => isTrain(d._1))
    val cntFull = train.flatMap { case (_, tx) =>
      wtoks(tx).map(t => t -> label(tx))
    }.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.count(_._2).toLong, xs.count(!_._2).toLong))
    }
    val cnt = cntFull.filter { case (_, (k, d)) => k + d >= minCount }
    val (nK, nD) =
      (cntFull.values.map(_._1).sum, cntFull.values.map(_._2).sum)
    val v = cntFull.size.toLong
    val nTrain = train.size.toLong
    val nKeepDocs = train.count(d => label(d._2)).toLong
    val priorK = bits((nTrain + 2) / (nKeepDocs + 1))
    val priorD = bits((nTrain + 2) / (nTrain - nKeepDocs + 1))
    eval.map { case (id, tx) =>
      val ts = wtoks(tx)
      val tbK = ts.map(t => bits((nK + v) / (cnt.getOrElse(t, (0L, 0L))._1 + 1))).sum
      val tbD = ts.map(t => bits((nD + v) / (cnt.getOrElse(t, (0L, 0L))._2 + 1))).sum
      val (bk, bd) = (priorK + tbK, priorD + tbD)
      id -> ((label(tx), ts.size.toLong, bk, bd, bk < bd))
    }.toMap
  }

  test("nbClassifier matches the hand-folded floor-bit model exactly") {
    val ref = handFold(docs)
    // fixture sanity: both classes present in the train half
    assert(docs.filter(d => isTrain(d._1)).exists(d => label(d._2)))
    assert(docs.filter(d => isTrain(d._1)).exists(d => !label(d._2)))
    val got = TextOps.nbClassifier(docs.toDF("doc_id", "text"))
      .as[(Long, Boolean, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == ref)
    // the separable fixture is classified perfectly on the held-out half
    assert(got.values.forall { case (lbl, _, _, _, pred) => pred == lbl })
  }

  test("token-free and null docs score prior-only and still appear") {
    val mixed = docs ++ Seq(100L -> "", 102L -> "   ", 104L -> "12 34 56 78 90")
    val base = mixed.toDF("doc_id", "text")
      .withColumn("text", when(col("doc_id") === 102L, lit(null: String))
        .otherwise(col("text")))
    val out = TextOps.nbClassifier(base)
      .as[(Long, Boolean, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val ref = handFold(docs) // priors shift only if 100/102/104 train
    for (id <- Seq(100L, 102L, 104L) if !isTrain(id)) {
      val r = out(id)
      assert(!r._2 && r._3 == 0L, s"doc $id should be drop/token-free")
      // prior-only scores: equal for every token-free doc
      val tokenFree = out.values.filter(_._3 == 0L)
      assert(tokenFree.map(x => (x._4, x._5)).toSet.size == 1)
    }
    // every held-out doc appears exactly once, no train doc leaks in
    val ids = TextOps.nbClassifier(base).select("doc_id")
      .as[Long].collect().sorted
    assert(ids.toSeq == mixed.map(_._1).filterNot(isTrain).sorted)
    assert(ref.keySet.forall(out.contains))
  }

  test("nbClassifier == hand fold on 6 random corpora (seeded)") {
    // random lengths, stopword densities, digit/punct tokens, empty
    // docs — stresses the label boundaries (length gate, avg-token-len
    // gate, stopword-ratio gate) and the smoothing on skewed splits,
    // far beyond the fixed fixture (hand-rolled seeded loop; the
    // scalatestplus-scalacheck bridge is not available offline)
    val rnd = new scala.util.Random(4242)
    val stop = TextOps.EnglishStopwords.toVector
    val content = Vector("cat", "dog", "sun", "rain", "tree", "data",
      "model", "spark", "train", "vector")
    val gib = Vector("zxqvk", "wqpzt", "lkmnb", "vcxzr", "tyuio", "qqqqzz")
    val odd = Vector("123", "ab3cd", "!!", "x")
    def word(): String = rnd.nextInt(4) match {
      case 0 => stop(rnd.nextInt(stop.size))
      case 1 => content(rnd.nextInt(content.size))
      case 2 => gib(rnd.nextInt(gib.size))
      case _ => odd(rnd.nextInt(odd.size))
    }
    for (c <- 1 to 6) {
      val corpus: Seq[(Long, String)] = (1L to 30L).map { i =>
        (c * 1000L + i) ->
          (1 to rnd.nextInt(30)).map(_ => word()).mkString(" ")
      }
      val ref = handFold(corpus)
      val got = TextOps.nbClassifier(corpus.toDF("doc_id", "text"))
        .as[(Long, Boolean, Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      assert(got == ref, s"corpus $c diverged from the hand fold")
    }
  }

  test("threshold sweep: θ=0 equals the verdict; totals conserved; monotone") {
    val nb = TextOps.nbClassifier(docs.toDF("doc_id", "text"))
      .as[(Long, Boolean, Long, Long, Long, Boolean)].collect()
    val sw = TextOps.nbThresholdSweep(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect()
    val nEval = nb.length.toLong
    // every θ row partitions the held-out set
    sw.foreach(r => assert(r._2 + r._3 + r._4 + r._5 == nEval))
    // the θ=0 row IS the default verdict (margin > 0 ⇔ predicted_keep)
    val z = sw.find(_._1 == 0L).get
    assert(z._2 == nb.count(r => r._6 && r._2))
    assert(z._3 == nb.count(r => r._6 && !r._2))
    assert(z._4 == nb.count(r => !r._6 && r._2))
    // raising θ only removes positive predictions: tp and fp monotone ↓
    val byTheta = sw.sortBy(_._1)
    byTheta.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3)
    }
  }

  test("train once, score elsewhere: unseen docs, batch == per-micro-batch") {
    // pinned for repeated scoring: the model frames are lazy plans and
    // an unpinned model would re-run training on every micro-batch
    val model = TextOps.nbTrain(docs.toDF("doc_id", "text")).cached()
    assert(model.cnt.storageLevel.useMemory, "model must be pinned")
    val unseen = Seq( // docs the model never saw, ids outside the corpus
      200L -> clean(0), 201L -> gibberish(1),
      202L -> "the new dog ran in a warm sun and the rain is fine today",
      203L -> "qqqqzz vvvvbb nnnnmm ccccxx zzzzaa ppppoo")
    val batch = TextOps.nbScore(unseen.toDF("doc_id", "text"), model)
      .as[(Long, Boolean, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // the distilled filter generalizes to unseen separable content
    assert(batch(200L)._6 && batch(202L)._6, s"clean must keep: $batch")
    assert(!batch(201L)._6 && !batch(203L)._6, s"gibberish must drop")
    // ingest-path application: the SAME model scores arriving
    // micro-batches inside foreachBatch (scoring is document-local)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val got = scala.collection.mutable.Map[Long,
      (Long, Boolean, Long, Long, Long, Boolean)]()
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        TextOps.nbScore(b.toDF(), model)
          .as[(Long, Boolean, Long, Long, Long, Boolean)].collect()
          .foreach(r => got.synchronized { got(r._1) = r })
        ()
      }.start()
    try {
      unseen.grouped(2).foreach { g =>
        input.addData(g: _*); q.processAllAvailable()
      }
      assert(got.toMap == batch,
        "per-micro-batch scoring must equal batch scoring")
    } finally { q.stop(); model.release() }
  }

  test("minCount cap shrinks the model table; capped scores match the hand fold") {
    val df = docs.toDF("doc_id", "text")
    val full = TextOps.nbTrain(df)
    val capped = TextOps.nbTrain(df, minCount = 3L)
    val (nFull, nCapped) = (full.cnt.count(), capped.cnt.count())
    assert(nCapped < nFull, s"cap must shrink the model: $nCapped/$nFull")
    // uncapped totals: smoothing denominators are the true distribution
    assert(capped.tot.collect().toSeq == full.tot.collect().toSeq)
    val eval = docs.filterNot(d => isTrain(d._1)).toDF("doc_id", "text")
    val got = TextOps.nbScore(eval, capped)
      .as[(Long, Boolean, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == handFold(docs, minCount = 3L))
    // the separable fixture survives the cap (frequent tokens carry it)
    assert(got.values.forall { case (lbl, _, _, _, pred) => pred == lbl })
  }

  test("nbAgreement conserves the held-out count with exact ppm") {
    val ag = TextOps.nbAgreement(docs.toDF("doc_id", "text"))
      .as[(Boolean, Boolean, Long, Long)].collect()
    val nEval = docs.count(d => !isTrain(d._1)).toLong
    assert(ag.map(_._3).sum == nEval)
    ag.foreach { case (_, _, n, ppm) => assert(ppm == n * 1000000L / nEval) }
    // perfect separation on this fixture: no off-diagonal cells
    assert(ag.forall { case (lbl, pred, _, _) => lbl == pred })
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PpjoinAndAuditSpec extends SparkSpec {
  import spark.implicits._

  // small corpus with clear near-dups, partial overlaps, and noise
  private lazy val docs = {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (1L, base),
      (2L, base + " extra"),                       // near-dup of 1
      (3L, "alpha beta gamma delta unrelated tail words here now ok"),
      (4L, "completely different content with no overlap at all really"),
      (5L, base),                                  // exact dup of 1
      (6L, "the quick brown fox jumps over the lazy dog again"),
      (7L, "the quick brown fox jumps over the lazy dog again"),
      (8L, "short doc")
    ).toDF("doc_id", "text")
  }

  private def bruteForce(tNum: Int, tDen: Int): Set[(Long, Long)] = {
    val sh = Dedup.shingleSets(docs)
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("i"),
        (size(col("a.sh")) + size(col("b.sh"))).cast("long").as("s"))
      .filter(col("i") * tDen >= (col("s") - col("i")) * tNum)
      .select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect().toSet
  }

  test("ppjoinExactPairs equals brute force at several thresholds") {
    for ((tn, td) <- Seq((1, 2), (1, 4), (3, 4))) {
      val got = Dedup.ppjoinExactPairs(docs, tn, td)
        .select(col("doc_a"), col("doc_b"))
        .as[(Long, Long)].collect().toSet
      assert(got == bruteForce(tn, td), s"threshold $tn/$td")
      assert(got.nonEmpty, s"degenerate fixture at $tn/$td")
    }
  }

  test("sorted_intersect_size equals size(array_intersect) on sorted sets") {
    val pairs = Seq(
      (Array("a", "b", "c"), Array("b", "c", "d")),
      (Array.empty[String], Array("a")),
      (Array("a"), Array.empty[String]),
      (Array("x", "y", "z"), Array("x", "y", "z")),
      (Array("a", "c", "e"), Array("b", "d", "f"))
    ).toDF("a", "b")
    val got = pairs.select(
        graft.functions.functions.sorted_intersect_size($"a", $"b").as("g"),
        size(array_intersect($"a", $"b")).cast("long").as("e"))
      .as[(Long, Long)].collect()
    got.foreach { case (g, e) => assert(g == e) }
  }

  test("prefix filter excludes corpus-wide boilerplate from candidates") {
    // every doc ends with the same boilerplate sentence; pairwise
    // similarity stays low, so prefixes (rarest half) never contain
    // the boilerplate shingles -> candidate count stays near zero
    // instead of all-pairs on the hot shingle
    // 9 unique words -> 9 i-specific shingles; 7 boiler words -> 5
    // shared shingles; sz = 14, prefix = 14 - ceil(7) + 1 = 8 <= 9,
    // so every prefix is entirely i-specific
    val boiler = " subscribe to our newsletter for more updates"
    val noisy = (1L to 40L).map(i =>
      (i, s"u$i a$i b$i c$i d$i e$i f$i g$i h$i" + boiler))
      .toDF("doc_id", "text")
    val cands = Dedup.ppjoinCandidatePairs(noisy, 1, 2).count()
    assert(cands == 0L,
      s"boilerplate shingles leaked into prefixes: $cands candidate pairs")
    // sanity: the uncapped hot-shingle join would have seen 40*39/2
    // pairs through the shared boilerplate alone
  }

  test("fkIntegrity counts orphans per edge") {
    val child = Seq((1L, 10L), (2L, 20L), (3L, 99L), (4L, 98L))
      .toDF("ck", "fk")
    val parent = Seq(Tuple1(10L), Tuple1(20L), Tuple1(30L)).toDF("pk")
    val got = Relational.fkIntegrity(Seq(("edge", child, "fk", parent, "pk")))
      .as[(String, Long, Long)].head()
    assert(got == (("edge", 4L, 2L)))
  }

  test("dimCovariance: exact pair moments, anti-correlated dims") {
    // lattice rows: v1 = (64, 128), v2 = (128, 64) -> perfectly
    // anti-correlated pair (0,1): cov_n2 = 2*16384 - 192*192 = -4096
    val emb = Seq((1L, Array(0.5f, 1.0f)), (2L, Array(1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.dimCovariance(emb)
      .select(col("dim_a"), col("dim_b"), col("n"),
        col("cov_n2").cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L, 4096L), (0L, 1L, 2L, -4096L), (1L, 1L, 2L, 4096L)))
  }

  test("dimStats: exact lattice moments on a handcrafted corpus") {
    val emb = Seq(
      (1L, Array(0.5f, -0.5f, 0.0f)),
      (2L, Array(1.0f, 0.25f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.dimStats(emb)
      .select(col("dim"), col("n"), col("sum_q").cast("long"),
        col("sumsq_q").cast("long"), col("min_q"), col("max_q"),
        col("n_zero"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // lattice: floor(x*128): dim0 -> 64,128; dim1 -> -64,32; dim2 -> 0,0
    assert(got == Set(
      (0L, 2L, 192L, 20480L, 64L, 128L, 0L),
      (1L, 2L, -32L, 5120L, -64L, 32L, 0L),
      (2L, 2L, 0L, 0L, 0L, 0L, 2L)))
  }
}

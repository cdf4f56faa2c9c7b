package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewAndRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // ---- binnedIntervalJoin ----------------------------------------

  private lazy val intervals = Seq(
    // (ivl_id, start, end) — closed intervals, varied lengths,
    // adjacent/overlapping/disjoint, bin-boundary-straddling
    (1L, 100L, 250L),
    (2L, 240L, 260L),   // overlaps 1
    (3L, 500L, 500L),   // degenerate point interval
    (4L, 990L, 1210L),  // straddles two bin boundaries at w=100
    (5L, 2000L, 2005L)
  ).toDF("ivl_id", "s", "e")

  private lazy val points = Seq(
    (10L, 99L), (11L, 100L), (12L, 250L), (13L, 251L), (14L, 245L),
    (15L, 500L), (16L, 501L), (17L, 1000L), (18L, 1210L), (19L, 1211L),
    (20L, 2003L), (21L, 3000L)
  ).toDF("pt_id", "p")

  private def bruteForcePairs: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select(col("pt_id"), col("ivl_id")).as[(Long, Long)]
      .collect().toSet

  test("binnedIntervalJoin equals the nested-loop join, several widths") {
    for (w <- Seq(1L, 7L, 100L, 1000L, 10000L)) {
      val got = Relational
        .binnedIntervalJoin(points, "p", intervals, "s", "e", w)
        .select(col("pt_id"), col("ivl_id")).as[(Long, Long)]
        .collect().toList
      assert(got.toSet == bruteForcePairs, s"binWidth=$w")
      // at most one bin meeting per pair — no duplicate rows
      assert(got.size == got.toSet.size, s"duplicate pairs at binWidth=$w")
    }
  }

  test("binnedIntervalJoin respects key columns") {
    val iv = Seq((1L, 0L, 100L), (2L, 0L, 100L)).toDF("k", "s", "e")
    val pt = Seq((1L, 50L), (2L, 50L), (3L, 50L)).toDF("k", "p")
    val got = Relational
      .binnedIntervalJoin(pt, "p", iv, "s", "e", 64L, keys = Seq("k"))
      .select(col("k")).as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // k=3 has no interval; no cross-key leaks
  }

  test("binnedIntervalJoin plans an equi-join, never a nested loop") {
    val p = Relational
      .binnedIntervalJoin(points, "p", intervals, "s", "e", 100L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    // while the PLAIN range join on the same inputs is the nested loop
    val naive = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin"), naive)
  }

  // ---- saltedJoin -------------------------------------------------

  test("saltedJoin is row-identical to the plain join under heavy skew") {
    // 90% of fact rows hit one key — the shape salting exists for
    val fact = (1L to 2000L).map { i =>
      val k = if (i % 10 != 0) 7L else i % 5
      (i, k, i * 3)
    }.toDF("row_id", "fk", "payload")
    val dim = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e")).toDF("dk", "attr")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select(col("row_id"), col("attr")).as[(Long, String)]
      .collect().sorted.toList
    val salted = Relational.saltedJoin(fact, "fk", dim, "dk",
        saltBuckets = 8, saltExpr = xxhash64(col("row_id")))
      .select(col("row_id"), col("attr")).as[(Long, String)]
      .collect().sorted.toList
    assert(salted == plain)
  }

  test("saltedJoin joins on (key, salt) and spreads the hot key") {
    val fact = (1L to 100L).map(i => (i, 7L)).toDF("row_id", "fk")
    val dim = Seq((7L, "hot")).toDF("dk", "attr")
    val joined = Relational.saltedJoin(fact, "fk", dim, "dk",
      saltBuckets = 4, saltExpr = xxhash64(col("row_id")))
    // salt participates in the join: condition carries __salt
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p)
    // the fact side actually uses more than one salt bucket
    val buckets = fact
      .withColumn("b", pmod(xxhash64(col("row_id")), lit(4L)))
      .select(col("b")).distinct().count()
    assert(buckets > 1)
    assert(joined.count() == 100L)
  }

  // ---- fdViolations ----------------------------------------------

  test("fdViolations counts violating groups and rows exactly") {
    val df = Seq(
      (1L, "x"), (1L, "x"),            // key 1: consistent
      (2L, "x"), (2L, "y"), (2L, "y"), // key 2: violated, 3 rows
      (3L, "z")                        // key 3: consistent
    ).toDF("k", "v")
    val got = Relational.fdViolations(Seq(("t.k->v", df, Seq("k"), "v")))
      .as[(String, Long, Long, Long)].head()
    assert(got == (("t.k->v", 3L, 1L, 3L)))
  }

  test("fdViolations: null RHS ignored, clean FD reports zero") {
    val df = Seq((1L, Some("x")), (1L, None), (2L, Some("y")))
      .toDF("k", "v")
    val got = Relational.fdViolations(Seq(("fd", df, Seq("k"), "v")))
      .as[(String, Long, Long, Long)].head()
    assert(got == (("fd", 2L, 0L, 0L)))
  }

  // ---- pcaPowerIteration -----------------------------------------

  test("pcaPowerIteration: exact integers on a handcrafted corpus") {
    // two dims, perfectly correlated: C is the n²-scaled covariance
    // matrix of the lattice; power iteration keeps the (1,1)-ish
    // direction with exactly reproducible integers
    val emb = Seq(
      (1L, Array(0.5f, 0.5f)),
      (2L, Array(1.0f, 1.0f)),
      (3L, Array(-0.5f, -0.5f))
    ).toDF("vec_id", "embedding")
    // lattice: (64,64), (128,128), (-64,-64); n=3
    // s = 128, s_ab(=s_aa) = 64²+128²+64² = 24576
    // C entries all = 3*24576 - 128*128 = 57344
    // v1 = C·1 = (114688, 114688); v2 = 2*57344*114688 each
    val c = 57344L
    val v1 = 2 * c
    val v2 = BigDecimal(2) * c * v1
    val got = Similarity.pcaPowerIteration(emb, iters = 2)
      .select(col("dim"), col("v").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(0L -> v2.toBigInt.toString, 1L -> v2.toBigInt.toString))
  }

  test("pcaScores: exact projections, extremes first, ties by vec_id") {
    // same perfectly-correlated corpus as above: direction = (v2, v2);
    // scores: vec1 = 128·v2, vec2 = 256·v2, vec3 = -128·v2 — order by
    // |score| puts vec2 first, then the |128·v2| tie breaks by id
    val emb = Seq(
      (1L, Array(0.5f, 0.5f)),
      (2L, Array(1.0f, 1.0f)),
      (3L, Array(-0.5f, -0.5f))
    ).toDF("vec_id", "embedding")
    val v2 = BigDecimal(2) * 57344L * (2 * 57344L)
    val got = Similarity.pcaScores(emb, iters = 2, topK = 3)
      .select(col("vec_id"), col("score").cast("string"))
      .as[(Long, String)].collect().toList
    assert(got == List(
      (2L, (v2 * 256).toBigInt.toString),
      (1L, (v2 * 128).toBigInt.toString),
      (3L, (-v2 * 128).toBigInt.toString)))
  }

  test("pcaPowerIteration finds the dominant direction's sign pattern") {
    // dim0 varies strongly, dim1 anti-correlated with dim0 (but NOT
    // exactly -dim0: that would make the all-ones start orthogonal to
    // the top eigenvector and exact arithmetic would stay at 0⃗),
    // dim2 constant (dead: its covariance row is exactly zero).
    // All magnitudes are powers of two, so the float lattice is exact.
    val emb = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f)),
      (2L, Array(-1.0f, 0.5f, 0.25f)),
      (3L, Array(0.5f, -0.25f, 0.25f)),
      (4L, Array(-0.25f, 0.125f, 0.25f))
    ).toDF("vec_id", "embedding")
    val v = Similarity.pcaPowerIteration(emb, iters = 3)
      .select(col("dim"), col("v").cast("decimal(38,0)"))
      .as[(Long, java.math.BigDecimal)].collect().toMap
    // dominant direction: dim0 and dim1 with opposite signs (the
    // anti-correlation), dead dim2 exactly zero
    assert(v(0L).signum() == 1 && v(1L).signum() == -1)
    assert(v(2L).signum() == 0)
    assert(v(0L).abs().compareTo(v(1L).abs()) > 0)
  }
}

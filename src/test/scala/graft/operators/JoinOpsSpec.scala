package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TopKByScore

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin: latest right row at-or-before each left ts, per key") {
    val facts = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (1L, ts("2024-01-01 09:00:00"), "early"),
      (2L, ts("2024-01-01 11:00:00"), "other-key"))
      .toDF("k", "t", "tag")
    val dim = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 20.0), // same-instant: must match
      (2L, ts("2024-01-01 23:00:00"), 99.0)) // only after the fact
      .toDF("k", "t", "v")
    val got = AsofJoin.asofJoin(facts, dim, "k", "t")
      .select($"tag", $"asof.v").as[(String, Option[Double])]
      .collect().toMap
    assert(got("a") == Some(10.0))
    assert(got("b") == Some(20.0)) // <= semantics: equal ts matches
    assert(got("early").isEmpty) // nothing at or before
    assert(got("other-key").isEmpty) // right row is later
  }

  test("asofJoinWithin nulls out matches older than the tolerance") {
    val facts = Seq(
      (1L, ts("2024-01-01 10:00:00"), "fresh"),
      (1L, ts("2024-01-01 23:00:00"), "stale"))
      .toDF("k", "t", "tag")
    val dim = Seq((1L, ts("2024-01-01 09:30:00"), 10.0)).toDF("k", "t", "v")
    val got = AsofJoin.asofJoinWithin(facts, dim, "k", "t", "1 HOUR")
      .select($"tag", $"asof.v").as[(String, Option[Double])]
      .collect().toMap
    assert(got("fresh") == Some(10.0)) // 30 min old: within tolerance
    assert(got("stale").isEmpty) // 13.5 h old: tolerance exceeded
  }

  test("asofJoin preserves every left row and all left columns") {
    val facts = Seq((1L, ts("2024-01-01 10:00:00"), "x", 42))
      .toDF("k", "t", "s", "n")
    val dim = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(facts, dim, "k", "t")
    assert(out.columns.toSeq == Seq("k", "t", "s", "n", "asof"))
    assert(out.count() == 1)
  }

  test("intervalJoin: containment is [start, end), no dup matches across buckets") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:14:59")),
      (3L, ts("2024-01-01 10:15:00")), // == end: excluded
      (4L, ts("2024-01-01 09:59:59")))
      .toDF("pid", "t")
    val ivs = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:15:00")))
      .toDF("iid", "s", "e")
    val got = RangeJoin.intervalJoin(points, "t", ivs, "s", "e")
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 100L), (2L, 100L)))
  }

  test("intervalJoin agrees with the naive cross-join formulation") {
    val points = (0 until 200)
      .map(i => (i.toLong, new Timestamp(1700000000000L + i * 97000L)))
      .toDF("pid", "t")
    val ivs = (0 until 20)
      .map(i => (i.toLong, new Timestamp(1700000000000L + i * 930000L),
        new Timestamp(1700000000000L + i * 930000L + 1800000L)))
      .toDF("iid", "s", "e")
    val fast = RangeJoin.intervalJoin(points, "t", ivs, "s", "e",
        bucketWidthUs = 600000000L)
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    val naive = points.crossJoin(ivs)
      .filter($"t" >= $"s" && $"t" < $"e")
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("edge cases: empty inputs and oversized k degrade gracefully") {
    val emptyPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.nearDupComponents(emptyPairs).count() == 0)
    assert(CdcOps.gapDetection(
      Seq.empty[Tuple1[Long]].toDF("event_id")).count() == 0)
    val facts = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "t", "s")
    val emptyDim = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("k", "t", "v")
    val asof = AsofJoin.asofJoin(facts, emptyDim, "k", "t")
    assert(asof.count() == 1 && asof.filter($"asof".isNotNull).count() == 0)
    // k larger than the candidate pool: return what exists, ranked
    val emb = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 0L), 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(topk.length == 1 && topk.head._2 == 1)
  }

  test("gapDetection finds intra- and inter-bucket gaps, none when contiguous") {
    val ids = ((0L to 50L) ++ (53L to 99L) ++ (220L to 260L)).map(Tuple1(_))
    val df = ids.toDF("event_id").repartition(4)
    // bucket 32 forces the 51/52 gap intra-bucket and 100..219 across buckets
    val got = CdcOps.gapDetection(df, bucket = 32L)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq((50L, 53L, 2L), (99L, 220L, 120L)))
    val clean = CdcOps.gapDetection((0L to 500L).map(Tuple1(_)).toDF("event_id"),
      bucket = 64L)
    assert(clean.count() == 0)
  }

  test("gapDetection: duplicate (redelivered) offsets do not mask a gap") {
    // {0,1,1,3}: count(*) == hi-lo+1 == 4 but id 2 is missing
    val df = Seq(0L, 1L, 1L, 3L).map(Tuple1(_)).toDF("event_id")
    val got = CdcOps.gapDetection(df, bucket = 32L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 1L)))
  }

  test("top_k orders NaN scores greatest and never wedges on them") {
    val scored = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, 0.9), (1L, 12L, 0.8),
      (1L, 13L, 0.7), (1L, 14L, Double.NaN))
      .toDF("query_id", "neighbor_id", "sim").repartition(3)
    val got = scored.groupBy($"query_id")
      .agg(TopKByScore.top_k($"sim", $"neighbor_id", $"sim", 3).as("top"))
      .select(posexplode($"top"))
      .select($"col.id").as[Long].collect().toSeq
    // NaN sorts greatest (Spark semantics), ties broken by id asc
    assert(got == Seq(10L, 14L, 11L))
  }

  test("nearDupComponents: transitive clusters labeled by min doc_id") {
    // two chains and a singleton pair: {1,2,3}, {10,11}, {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.nearDupComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("nearDupComponents converges on a long path graph") {
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.nearDupComponents(pairs, maxRounds = 30)
      .as[(Long, Long)].collect()
    assert(got.length == 13)
    assert(got.forall(_._2 == 0L))
  }

  test("starContractComponents equals label propagation on random graphs") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val pairs = (1 to n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
      val star = Dedup.starContractComponents(pairs)
        .as[(Long, Long)].collect().toMap
      val prop = Dedup.nearDupComponents(pairs, maxRounds = 128)
        .as[(Long, Long)].collect().toMap
      assert(star == prop, s"trial $trial")
    }
  }

  test("starContractComponents: adversarial shapes (chain, clique, star)") {
    // 64-node chain: diameter 63 — label propagation needs ~63 rounds,
    // star contraction O(log n)
    val chain = (0L until 63L).map(i => (i + 1, i)).toDF("doc_a", "doc_b")
    val gotChain = Dedup.starContractComponents(chain)
      .as[(Long, Long)].collect()
    assert(gotChain.length == 64 && gotChain.forall(_._2 == 0L))
    // 20-clique plus disjoint pair
    val clique = (for {
      a <- 100L until 120L; b <- (a + 1) until 120L
    } yield (a, b)) :+ ((500L, 501L))
    val gotClique = Dedup.starContractComponents(clique.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert((100L until 120L).forall(gotClique(_) == 100L))
    assert(gotClique(500L) == 500L && gotClique(501L) == 500L)
    // hub star with reversed/duplicate edges
    val hub = Seq((7L, 3L), (3L, 7L), (7L, 9L), (7L, 9L), (11L, 7L))
      .toDF("doc_a", "doc_b")
    val gotHub = Dedup.starContractComponents(hub)
      .as[(Long, Long)].collect().toMap
    assert(gotHub == Map(3L -> 3L, 7L -> 3L, 9L -> 3L, 11L -> 3L))
    // empty input degrades to empty output
    assert(Dedup.starContractComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() == 0)
  }

  test("hashSample: deterministic, id-stable slice of roughly pct percent") {
    val docs = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = TextOps.hashSample(docs, "doc_id", 10).select($"doc_id")
      .as[Long].collect().sorted.toSeq
    val b = TextOps.hashSample(docs.repartition(7), "doc_id", 10)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b) // partitioning-independent membership
    assert(a.size > 50 && a.size < 200) // ~10% of 1000
    val bigger = TextOps.hashSample(docs, "doc_id", 50).count()
    assert(bigger > a.size)
  }

  test("weightedSample: weight 1 keeps all, 0 none, mid-weights proportional") {
    val df = (0L until 1000L).map(i => (i, i % 2 == 0)).toDF("doc_id", "good")
    assert(TextOps.weightedSample(df, "doc_id", lit(1.0)).count() == 1000L)
    assert(TextOps.weightedSample(df, "doc_id", lit(0.0)).count() == 0L)
    val half = TextOps.weightedSample(df, "doc_id", lit(0.5)).count()
    assert(half > 400L && half < 600L)
    val byCol = TextOps.weightedSample(df, "doc_id",
      when($"good", 1.0).otherwise(0.0))
    assert(byCol.count() == 500L && byCol.filter(!$"good").count() == 0L)
  }

  test("stratifiedSample: at most quota rows per stratum, deterministic") {
    val docs = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "lang")
    val s1 = TextOps.stratifiedSample(docs, "lang", "doc_id", 20)
    val counts = s1.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 20L))
    val s2 = TextOps.stratifiedSample(docs.repartition(5), "lang", "doc_id", 20)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(s1.select($"doc_id").as[Long].collect().sorted.toSeq == s2)
  }

  test("hstore_render equals the higher-order composition (incl. nulls)") {
    val df = Seq(1).toDF("x").select(
      map(lit("b"), lit("2"), lit("a"), lit("1")).as("m"),
      map(lit("k"), lit(null).cast("string"), lit("v"), lit("x")).as("mn"),
      lit(null).cast("map<string,string>").as("mnull"))
    def composed(m: org.apache.spark.sql.Column) =
      when(m.isNull, lit(null).cast("string"))
        .otherwise(array_join(transform(array_sort(map_keys(m)),
          k => concat(lit("\""), k, lit("\"=>\""), element_at(m, k), lit("\""))),
          ", "))
    val got = df.select(
      graft.functions.functions.hstore_render($"m"), composed($"m"),
      graft.functions.functions.hstore_render($"mn"), composed($"mn"),
      graft.functions.functions.hstore_render($"mnull"), composed($"mnull"))
      .as[(String, String, String, String, Option[String], Option[String])]
      .head()
    assert(got._1 == got._2 && got._1 == "\"a\"=>\"1\", \"b\"=>\"2\"")
    assert(got._3 == got._4 && got._3 == "\"v\"=>\"x\"")
    assert(got._5 == got._6 && got._5.isEmpty)
  }

  test("lsh_bands equals the composed concat/h60 per-band formulation") {
    val sig = (1L to 32L).toSeq
    val df = Seq(Tuple1(sig)).toDF("sig")
    val viaExpr = df.select(graft.functions.functions.lsh_bands($"sig", 8))
      .as[Seq[Long]].head()
    val viaCompose = df.select(transform(sequence(lit(0), lit(7)),
        b => graft.functions.functions.h60(concat(b.cast("string"), lit(":"),
          concat_ws(",", transform(slice($"sig", b * 4 + lit(1), lit(4)),
            x => x.cast("string")))))))
      .as[Seq[Long]].head()
    assert(viaExpr == viaCompose)
    assert(viaExpr.size == 8)
  }

  test("top_k aggregate equals the window row_number formulation") {
    val n = 500
    val scored = (0 until n).map { i =>
      val q = i % 3
      // deliberate tie groups via the mod-7 score lattice
      val s = (i % 7).toDouble / 7.0
      (q.toLong, i.toLong, s)
    }.toDF("query_id", "neighbor_id", "sim").repartition(8)
    val viaAgg = scored.groupBy($"query_id")
      .agg(TopKByScore.top_k(round($"sim", 6), $"neighbor_id", $"sim", 5)
        .as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", ($"pos" + 1).cast("int").as("rank"),
        $"col.id".as("neighbor_id"), round($"col.sim", 4).as("sim"))
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id")
      .orderBy(round($"sim", 6).desc, $"neighbor_id")
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"neighbor_id", round($"sim", 4).as("sim"))
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 15)
  }
}

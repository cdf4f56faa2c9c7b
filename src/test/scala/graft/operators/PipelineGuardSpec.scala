package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The round-6 pipeline-guard operators: leakage-safe splitting,
 * per-source domain caps, and metadata-filtered vector search — the
 * properties that make each one trustworthy, not just its values
 * (those are oracle-gated).
 */
class PipelineGuardSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.ChangeLogSource.table(spark, dir, "documents")
  private def emb = graft.sources.ChangeLogSource.table(spark, dir, "embeddings")

  test("leakageSafeSplit: no near-dup pair straddles the split") {
    val split = Dedup.leakageSafeSplit(docs, threshold = 0.1, valPct = 10)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup.nearDuplicatePairs(docs, threshold = 0.1)
    val straddling = pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddling == 0L)
    // covers every document exactly once, both sides non-trivial
    val n = docs.count()
    assert(split.count() == n)
    assert(split.select(col("doc_id")).distinct().count() == n)
    val byCounts = split.groupBy(col("split")).count()
      .as[(String, Long)].collect().toMap
    assert(byCounts.keySet.subsetOf(Set("train", "val")))
    assert(byCounts.getOrElse("train", 0L) > 0L)
    // a 10% target on 500 docs: val side present but minority
    val vals = byCounts.getOrElse("val", 0L)
    assert(vals > 0L && vals < n / 2, s"val side $vals of $n")
  }

  test("leakageSafeSplit is deterministic and component-constant") {
    val a = Dedup.leakageSafeSplit(docs, threshold = 0.1, valPct = 10)
      .collect().map(_.toSeq).toSet
    val b = Dedup.leakageSafeSplit(docs, threshold = 0.1, valPct = 10)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // every component maps to exactly one split value
    val perComp = Dedup.leakageSafeSplit(docs, threshold = 0.1, valPct = 10)
      .groupBy(col("component"))
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(perComp == 0L)
  }

  test("domainCap: at most perSource docs per source, quality dominates") {
    val capped = TextOps.domainCap(docs, perSource = 7)
    val perSource = capped.groupBy(col("source")).count()
      .as[(String, Long)].collect()
    assert(perSource.nonEmpty)
    perSource.foreach { case (s, n) => assert(n <= 7, s"$s kept $n") }
    // ranks are 1..n per source with no gaps
    val ranks = capped.groupBy(col("source"))
      .agg(min(col("rank")).as("lo"), max(col("rank")).as("hi"),
        count(lit(1)).as("n"))
      .as[(String, Int, Int, Long)].collect()
    ranks.foreach { case (_, lo, hi, n) => assert(lo == 1 && hi == n) }
    // cap_score ordering: rank 1 has the max score within its source
    val mono = capped.as("a").join(capped.as("b"),
        col("a.source") === col("b.source") &&
          col("a.rank") < col("b.rank") &&
          col("a.cap_score") < col("b.cap_score"))
      .count()
    assert(mono == 0L, "rank not monotone in cap_score")
  }

  test("filteredTopK: every neighbor satisfies the predicate; k rows per query") {
    val queries = emb.filter(col("vec_id") < 10)
    val got = Similarity.filteredTopK(emb, queries, 3, col("label") === 1)
    val labels = emb.select(col("vec_id").as("neighbor_id"), col("label"))
    assert(got.join(labels, "neighbor_id")
      .filter(col("label") =!= 1).count() == 0L)
    val perQuery = got.groupBy(col("query_id")).count()
      .as[(Long, Long)].collect()
    assert(perQuery.length == 10)
    perQuery.foreach { case (_, n) => assert(n == 3L) }
    // pre-filtering ≠ post-filtering: the filtered top-k must contain
    // label-1 neighbors that an unfiltered top-3 would have missed
    val unfiltered = Similarity.bruteForceTopK(emb, queries, 3)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val filtered = got.select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    assert((filtered -- unfiltered).nonEmpty,
      "filter did not change any top-k (degenerate fixture)")
  }

  test("joinSizeEstimate: total equals the materialized join exactly") {
    val ev = graft.sources.ChangeLogSource.table(spark, dir, "events")
    val right = ev.filter(col("event_type") === "purchase")
    val est = Relational.joinSizeEstimate(ev, "user_id", right, "user_id")
    val totalEst = est.select(col("total_pairs").cast("long"))
      .as[Long].head()
    val actual = ev.select(col("user_id"))
      .join(right.select(col("user_id")), "user_id").count()
    assert(totalEst == actual, s"estimate $totalEst vs actual $actual")
    // share_ppm sums to ≤ 1e6 over the top keys and each row's pairs
    // = n_left * n_right
    val bad = est.filter(
      col("pairs") =!= col("n_left").cast("decimal(38,0)") * col("n_right"))
      .count()
    assert(bad == 0L)
    assert(est.agg(sum(col("share_ppm"))).as[Long].head() <= 1000000L)
  }

  test("dimStats shard-merge: re-summed halves equal the whole corpus") {
    // the 100 TB claim in dimStats' doc — per-shard lattices merge by
    // re-summing — proven on a real split (min/max via min/max, counts
    // and moments via sums)
    val whole = Similarity.dimStats(emb)
    val a = Similarity.dimStats(emb.filter(pmod(col("vec_id"), lit(2L)) === 0))
    val b = Similarity.dimStats(emb.filter(pmod(col("vec_id"), lit(2L)) === 1))
    val merged = a.unionByName(b)
      .groupBy(col("dim"))
      .agg(sum(col("n")).as("n"), sum(col("sum_q")).as("sum_q"),
        sum(col("sumsq_q")).as("sumsq_q"),
        min(col("min_q")).as("min_q"), max(col("max_q")).as("max_q"),
        sum(col("n_zero")).as("n_zero"))
      .select(col("dim"), col("n"),
        // the public edge is BIGINT (r7); re-summed longs stay long
        col("sum_q").cast("long").as("sum_q"),
        col("sumsq_q").cast("long").as("sumsq_q"),
        col("min_q"), col("max_q"), col("n_zero"))
    assert(merged.collect().map(_.toSeq).toSet ==
      whole.collect().map(_.toSeq).toSet)
  }

  test("filteredTopK pushes the metadata predicate into the corpus scan") {
    val df = Similarity.filteredTopK(emb, emb.filter(col("vec_id") < 10), 3,
      col("label") === 1)
    val pushed = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("EqualTo(label,1)"),
      s"label predicate not pushed:\n$pushed")
  }
}

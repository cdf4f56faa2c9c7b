package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.EventGroups
import graft.sources.ChangeLogSource
import graft.sources.ChangeLogSource.OffsetRange

/**
 * Physical-plan assertions: the scale claims in the README — pushdown,
 * broadcast enrichment, map-side partial top-k — must be visible in the
 * plans, not just intended. Loose `contains` checks so minor plan
 * formatting changes across Spark versions don't break them.
 */
class PlanAssertionsSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val sfDir = "/root/testdata/sf0.001"

  test("range scan pushes offset predicates into the parquet scan") {
    val df = ChangeLogSource.rangeScan(
      ChangeLogSource.table(spark, sfDir, "events"),
      OffsetRange(100, 5000), EventGroups.All)
    val p = plan(df)
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThan(event_id,100)"),
      s"offset lower bound not pushed:\n$p")
    assert(p.contains("LessThanOrEqual(event_id,5000)"),
      s"offset upper bound not pushed:\n$p")
  }

  test("projection prunes the parquet read schema to selected columns") {
    val df = ChangeLogSource.table(spark, sfDir, "events")
      .select($"event_id", $"user_id")
    val p = plan(df)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("event_id") && readSchema.contains("user_id"))
    assert(!readSchema.contains("props"), s"props not pruned: $readSchema")
  }

  test("commit-ts enrichment is a broadcast join (fact side never shuffles)") {
    val log = ChangeLogSource.table(spark, sfDir, "events")
    val df = CdcOps.enrichCommitTs(log, CdcOps.commitTsDim(log))
    assert(plan(df).contains("BroadcastHashJoin"))
  }

  test("brute-force top-k runs partial aggregation before the shuffle") {
    val emb = ChangeLogSource.table(spark, sfDir, "embeddings")
    val df = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3), 2)
    val p = plan(df)
    // TopKByScore is an ObjectHashAggregate: partial + final around one
    // exchange, i.e. at most k candidates per partition cross the wire
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("asof join shuffles each side exactly once") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val dim = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val df = AsofJoin.asofJoin(ev, dim, "user_id", "ts")
    val p = plan(df)
    assert(p.contains("Window"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"asof join must not degenerate into a pair join:\n$p")
  }

  test("q6 pushes every scalar predicate into the parquet scan") {
    val df = Relational.q6ForecastRevenue(
      ChangeLogSource.table(spark, sfDir, "lineitem"))
    val pushed = plan(df).linesIterator
      .find(_.contains("PushedFilters")).getOrElse("")
    // the plan string elides long filter lists ("...") — assert on the
    // filters visible before the cut and on the scan having data filters
    assert(pushed.contains("PushedFilters: [IsNotNull"), s"nothing pushed: $pushed")
    assert(pushed.contains("l_shipdate"), s"shipdate not pushed: $pushed")
    assert(pushed.contains("DataFilters: [isnotnull(l_shipdate"),
      s"scan-level data filters missing: $pushed")
  }

  test("q19's dimension join broadcasts part; lineitem never shuffles") {
    val df = Relational.q19BrandRevenue(
      ChangeLogSource.table(spark, sfDir, "part"),
      ChangeLogSource.table(spark, sfDir, "lineitem"))
    assert(plan(df).contains("BroadcastHashJoin"))
  }

  test("knn label agreement never shuffles the corpus scan") {
    val emb = ChangeLogSource.table(spark, sfDir, "embeddings")
    val df = Similarity.knnLabelAgreement(emb, k = 3, sampleMod = 100)
    val p = plan(df)
    // corpus reaches the scorer via broadcast of the sampled queries:
    // the only exchanges are the tiny post-top-k aggregations
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("hll registers combine map-side (partial_max before the exchange)") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val p = plan(Sketches.hllRegisters(ev))
    // partial + final HashAggregate around one exchange: at most
    // keys × 2^p register rows per partition cross the wire
    assert("partial_max".r.findAllIn(p).size >= 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("health report is one aggregation pass — no join, no window") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val p = plan(CdcOps.healthReport(ev))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
  }

  test("transition matrix windows per user — no global sort before agg") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val p = plan(CdcOps.transitionMatrix(ev))
    // the lag window sorts WITHIN user partitions (hashpartitioning on
    // user_id), never range-partitions the whole log; the only range
    // exchange is the final presentation ORDER BY of the tiny matrix
    val exchanges = "rangepartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, p)
    assert(p.contains("hashpartitioning(user_id"), p)
  }

  test("star join keeps the year filter on the fact scan") {
    def tt(n: String) = ChangeLogSource.table(spark, sfDir, n)
    val p = plan(Relational.starJoinRevenue(tt("lineitem"), tt("orders"),
      tt("customer"), tt("nation"), tt("region"), tt("part"),
      tt("supplier")))
    assert(p.contains("PushedFilters"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_shipdate")), p)
  }

  test("prefix decomposition: only the super-bucket level windows unpartitioned") {
    import org.apache.spark.sql.execution.window.WindowExec
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val wins = CdcOps.runningWatermark(ev).queryExecution.sparkPlan
      .collect { case w: WindowExec => w.partitionSpec.isEmpty }
    // level 1 (per bucket) and level 2 (per super-bucket) are keyed;
    // only level 3 — one row per super-bucket — runs unpartitioned
    assert(wins.count(identity) == 1, s"unpartitioned windows: $wins")
    assert(wins.count(!_) == 2, s"keyed windows: $wins")
  }

  test("sq8 top-k: corpus never shuffles; candidates aggregate partially") {
    val emb = ChangeLogSource.table(spark, sfDir, "embeddings")
    val p = plan(Similarity.sq8TopK(emb, emb.filter($"vec_id" < 3), 2))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("pageRank iterations stay keyed — no cartesian product") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 2L)).toDF("src", "dst", "w")
    val p = plan(Graph.pageRankInt(edges, iters = 3))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("matryoshka: one pair enumeration; survivors re-join by id") {
    val emb = ChangeLogSource.table(spark, sfDir, "embeddings")
    val p = plan(Similarity.matryoshkaTopK(emb, emb.filter($"vec_id" < 3), 2))
    // stage 1 is the only cross join; stage 2 must be keyed joins
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("bloom words aggregate partially before the exchange") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(Sketches.bloomWords(docs))
    assert(p.contains("partial_bit_or"), p)
  }

  test("delete-aware mirror: aggregate fold, broadcast truncate mark, no window") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
      .withColumn("action", graft.sources.AuditLogGenerator.action)
    val p = plan(CdcOps.applyChangesWithActions(ev.limit(10), ev.limit(5)))
    // the truncate watermark is a 1-row aggregate broadcast back; the
    // upsert is the same partial max_by fold as applyChanges
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_max_by"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("deterministic IVF: assignment is an argmax aggregate, not a corpus window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val emb = ChangeLogSource.table(spark, sfDir, "embeddings")
    val df = Similarity.ivfDetTopK(emb, emb.filter($"vec_id" < 3), 2,
      stride = 29, nprobe = 2)
    val p = plan(df)
    // centroids ride along broadcast; corpus-side nearest-centroid is
    // max_by (partial map-side)
    assert(p.contains("partial_max_by"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the only windows rank the QUERY side (partitioned by query_id) —
    // nothing windows the corpus
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(
      _.partitionSpec.exists(_.toString.contains("query_id"))), p)
  }

  test("star contraction round: keyed joins + groupBy-min, no cartesian/window") {
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("u", "v")
    val p = plan(Dedup.starRound(edges))
    // both star steps are groupBy-min + equi-join on the node key —
    // per round one keyed shuffle family, nothing quadratic or sorted
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min"), p)
    assert(p.contains("hashpartitioning(a"), p)
  }

  // ---- r8 verdict item 8: plan pins for the remaining §10.11
  // heavy-probe operators, so the measured 100× ratios cannot drift
  // silently (a plan regression fails a spec, not a sweep) ----

  private def keyedWindowsOnly(df: DataFrame, allowUnpartitioned: Int = 0)
      : Unit = {
    import org.apache.spark.sql.execution.window.WindowExec
    val wins = df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w.partitionSpec.isEmpty }
    assert(wins.count(identity) <= allowUnpartitioned,
      s"unpartitioned windows: $wins")
  }

  test("leakage split: keyed joins after components, no cartesian, keyed windows") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val df = Dedup.leakageSafeSplit(docs, threshold = 0.1, valPct = 10)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    keyedWindowsOnly(df)
  }

  test("ppjoin exact pairs: keyed prefix self-join, nothing quadratic, no global sort") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val df = Dedup.ppjoinExactPairs(docs, tNum = 1, tDen = 2)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert("rangepartitioning".r.findAllIn(p).size <= 1, p)
    keyedWindowsOnly(df)
  }

  test("ngram jaccard pairs: gram-keyed candidates, no cartesian, keyed windows") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val df = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    keyedWindowsOnly(df)
  }

  test("label-prop components and survivors: keyed equi-joins only") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val pairs = Dedup.nearDuplicatePairs(docs, threshold = 0.1)
    val comps = Dedup.nearDupComponents(pairs)
    assert(!plan(comps).contains("CartesianProduct"), plan(comps))
    val surv = Dedup.nearDupSurvivors(
      comps.select($"id".as("doc_id"), $"component"), docs)
    val p = plan(surv)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    keyedWindowsOnly(surv)
  }

  test("link prediction over capped neighbors: no cartesian, keyed windows") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val df = Graph.linkPrediction(
      Graph.topKNeighbors(
        Graph.cooccurrenceEdges(ev, date_trunc("hour", $"ts"),
          $"user_id", minShared = 2L), k = 10),
      maxDeg = 512, minCommon = 1)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    keyedWindowsOnly(df)
  }

  test("k-core peel: keyed degree joins each round, nothing quadratic") {
    val edges = (0L until 30L).flatMap(i =>
      Seq((i, (i + 1) % 30L), (i, (i + 2) % 30L))).toDF("src", "dst")
    val df = Graph.kCore(edges, k = 3)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    keyedWindowsOnly(df)
  }

  test("bigram surprisal: token-keyed joins + broadcast totals only") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val df = TextOps.bigramSurprisal(docs)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    // the only pair-joins allowed are the 1-row broadcast totals
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
    assert("rangepartitioning".r.findAllIn(p).size <= 1, p)
    keyedWindowsOnly(df)
  }

  test("bpe trainer output: round union, no window, no cartesian") {
    // the per-round shape (vocab-keyed pair agg + TakeOrderedAndProject
    // top-1 + broadcast 1-row merge) sits behind each round's LAZY
    // localCheckpoint, so the outer plan pins the composition: a union
    // of round frames with only the final presentation sort
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val df = TextOps.bpeLearn(docs, merges = 2)
    val p = plan(df)
    assert(p.contains("Union"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("rangepartitioning".r.findAllIn(p).size <= 1, p)
    keyedWindowsOnly(df)
  }

  test("gap detection: bucket-keyed windows, one super-level boundary window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val df = CdcOps.gapDetection(ev)
    val wins = df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w.partitionSpec.isEmpty }
    assert(wins.count(identity) <= 1, s"unpartitioned windows: $wins")
    assert(wins.count(!_) >= 2, s"keyed windows: $wins")
    assert(!plan(df).contains("CartesianProduct"), plan(df))
  }

  test("series knn: banded candidates aggregate partially, no cartesian") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val df = TimeSeries.seriesKnn(ev, $"user_id" % 10 === 0, k = 5)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // TopKByScore: partial + final ObjectHashAggregate around the
    // query-keyed exchange — at most k candidates per partition move
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("training/curation/media manifests: composed plans stay keyed") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    // training manifest (the ScaleCheck probe's composition)
    val exact = Dedup.exactDedup(docs)
    val comps = Dedup.nearDupComponents(
        Dedup.nearDuplicatePairs(exact, threshold = 0.1))
      .select($"id".as("doc_id"), $"component")
    val survivors = Dedup.nearDupSurvivors(comps, exact)
      .select($"survivor_id")
    val dropped = comps.join(survivors,
        comps("doc_id") === survivors("survivor_id"), "left_anti")
      .select($"doc_id")
    val kept = exact.join(dropped, Seq("doc_id"), "left_anti")
    val gated = kept.join(
      TextOps.qualityScore(kept).filter($"quality" >= 0.5)
        .select($"doc_id"), Seq("doc_id"), "left_semi")
    val training = TextOps.shardAssign(gated)
    assert(!plan(training).contains("CartesianProduct"), plan(training))
    keyedWindowsOnly(training)
    // curation manifest
    val capped = docs.join(
      TextOps.domainCap(docs, perSource = 50).select($"doc_id"),
      Seq("doc_id"), "left_semi")
    val train = capped.join(
      Dedup.leakageSafeSplit(capped, threshold = 0.1, valPct = 10)
        .filter($"split" === "train").select($"doc_id"),
      Seq("doc_id"), "left_semi")
    val curation = TextOps.shardAssign(train)
    assert(!plan(curation).contains("CartesianProduct"), plan(curation))
    keyedWindowsOnly(curation)
    // media manifest (shardPack's prefix sum decomposes: the one
    // unpartitioned window runs at the super-bucket level only)
    val media = Multimodal.asMedia(docs, "doc_id",
      $"text".cast("binary"), "image")
    val mpairs = Multimodal.phashNearDupPairsAuto(media)
      .select($"doc_a", $"doc_b")
    val comp = Dedup.starContractComponents(mpairs)
    val msurv = comp.groupBy($"component").agg(min($"id").as("doc_id"))
    val keep = media.join(comp.select($"id".as("doc_id")),
        Seq("doc_id"), "left_anti")
      .select($"doc_id", $"meta")
      .unionByName(media.join(msurv.select($"doc_id"),
        Seq("doc_id"), "left_semi").select($"doc_id", $"meta"))
    val packed = Multimodal.shardPack(keep)
    assert(!plan(packed).contains("CartesianProduct"), plan(packed))
    keyedWindowsOnly(packed, allowUnpartitioned = 1)
  }

  test("phash pair join carries the stop-bucket anti-join guard in-plan") {
    // r9 verdict item 1 regression pin: the hardened media path keeps
    // (a) the hot-bucket LeftAnti guard ahead of the self-join, (b) a
    // band/bv-keyed equi-join (never a cartesian), and (c) only
    // (id, 8-byte hash)-width rows in the join (payloads never move).
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val media = Multimodal.asMedia(docs, "doc_id",
      $"text".cast("binary"), "image")
    // the LeftAnti guard is pinned on the capped stage directly — the
    // pair stage checkpoints it, truncating it out of the final plan
    val ps = plan(Multimodal.phashCappedStage(media))
    assert(ps.contains("LeftAnti"), s"stop-bucket guard missing:\n$ps")
    val p = plan(Multimodal.phashNearDupPairsAuto(media))
    assert(p.contains("ExistingRDD"),
      s"pair join must read the checkpointed hash table:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning(band") ||
      p.contains("band#"), s"band-keyed join missing:\n$p")
    assert(!p.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("payload")),
      s"payload bytes must not enter the pair join:\n$p")
    // the WIDE (multi-word) path keeps the identical discipline at
    // widths past one long: band-keyed equi-join, payloads never in
    // the join (only the 2x8-byte word array)
    val pw = plan(Multimodal.phashNearDupPairsWide(media, bits = 120))
    assert(pw.contains("ExistingRDD"), pw)
    assert(!pw.contains("CartesianProduct"), pw)
    assert(pw.contains("hashpartitioning(band") ||
      pw.contains("band#"), s"wide band-keyed join missing:\n$pw")
    assert(!pw.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("payload")),
      s"payload bytes must not enter the wide pair join:\n$pw")
    // the GENERIC precomputed-hash operator keeps the discipline too
    val hashed = docs.select($"doc_id",
      array(graft.functions.functions.h60(concat(md5($"text"), lit(":a"))),
        graft.functions.functions.h60(concat(md5($"text"), lit(":b"))))
        .as("phs"))
    // same checkpoint truncation as the phash paths: the LeftAnti
    // guard is pinned above on the shared cappedBands stage; the
    // final plan must read the checkpoint and stay band-keyed
    val pg = plan(Multimodal.hashNearDupPairs(hashed, "doc_id", "phs",
      nWords = 2, bandBits = 20))
    assert(pg.contains("ExistingRDD"), pg)
    assert(!pg.contains("CartesianProduct"), pg)
  }

  test("dupSpans joins spans on the fingerprint key, never a global sort") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(TextOps.dupSpans(docs).limit(1))
    // fp-keyed hash exchanges; the only rangepartitioning allowed is
    // the final presentation ORDER BY
    assert(p.contains("hashpartitioning(fp"), p)
    assert("rangepartitioning".r.findAllIn(p).size <= 1, p)
  }

  test("dupSpanRuns: fp-keyed df join + exactly one doc-keyed window") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(TextOps.dupSpanRuns(docs).limit(1))
    // span df joins on the fingerprint; the gaps-and-islands
    // row_number is the ONLY window, and it partitions by doc_id
    // (per-doc sorts, nothing global)
    assert(p.contains("hashpartitioning(fp"), p)
    val df2 = TextOps.dupSpanRuns(docs)
    val wins = df2.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.size == 1, s"expected 1 window, got ${wins.size}")
    assert(wins.head.partitionSpec.exists(_.toString.contains("doc_id")))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("contaminationFuzzy: gram-keyed join, no window, nothing quadratic") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(TextOps.contaminationFuzzy(docs).limit(1))
    // candidates come from the gram-keyed equi-join (df-capped);
    // the verify is a per-row levenshtein on the candidate set —
    // no window, no cartesian, no nested loop anywhere
    assert(p.contains("hashpartitioning(gram"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bpeEncode: corpus side joins the vocab, rollup is doc-keyed, no window") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(TextOps.bpeEncode(docs, merges = 2).limit(1))
    // the learned vocab rides a broadcast (Zipf-bounded side); the
    // per-doc rollup is a partial-aggregated keyed count — no window,
    // no cartesian
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_count") || p.contains("partial count"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pq: codebook and LUT broadcast; encode is a min_by aggregate") {
    val emb = ChangeLogSource.table(spark, sfDir, "embeddings")
    val p = plan(Similarity.pqTopK(emb, emb.filter($"vec_id" < 3), 2))
    // both small sides ride broadcast exchanges; the corpus-side
    // encode and the ADC sum are partial aggregates, never windows
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_min_by") || p.contains("min_by"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("kn bigrams: bounded top-N via TakeOrderedAndProject, no global sort") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(TextOps.knBigramCounts(docs)
      .orderBy($"c".desc, $"w1", $"w2").limit(100))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), p)
    // token stream combines map-side before the bigram-key exchange
    assert(p.contains("partial_count"), p)
  }

  test("correlated scalar subqueries decorrelate to one agg + join") {
    val orders = ChangeLogSource.table(spark, sfDir, "orders")
    val p = plan(Relational.aboveAverageOrders(orders))
    // both correlated scalars must rewrite to joins against a keyed
    // aggregate — never per-row nested-loop re-execution
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(p.contains("Join"), p)
  }

  test("mad outliers: both rank windows partition by user — never global") {
    import org.apache.spark.sql.execution.window.WindowExec
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val wins = TimeSeries.madOutliers(ev).queryExecution.sparkPlan
      .collect { case w: WindowExec => w.partitionSpec.isEmpty }
    assert(wins.nonEmpty && wins.forall(!_),
      s"global window in madOutliers: $wins")
  }

  test("triangles: keyed equi-joins only — no cartesian, no window") {
    val edges = (0L until 30L).map(i => (i, (i * 7) % 30))
      .toDF("src", "dst")
    val p = plan(Graph.triangleStats(edges))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("autocorr and level-shift: every window partitions by user; level-shift has no join") {
    import org.apache.spark.sql.execution.window.WindowExec
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    for (df <- Seq(TimeSeries.autocorrLag(ev),
        TimeSeries.levelShifts(ev))) {
      val wins = df.queryExecution.sparkPlan
        .collect { case w: WindowExec => w.partitionSpec.isEmpty }
      assert(wins.nonEmpty && wins.forall(!_),
        s"global window: $wins")
    }
    // the changepoint scan is frame windows + filter ONLY — one
    // user-keyed shuffle, nothing else moves data
    val p = plan(TimeSeries.levelShifts(ev))
    assert(!p.contains("Join"), p)
  }

  test("mmr: pool selection aggregates partially; corpus never shuffles before it") {
    val emb = ChangeLogSource.table(spark, sfDir, "embeddings")
    // stage 1 pool: bounded TopKByScore partial aggregation on the
    // scan side of the exchange (bruteForceTopK's contract). Pinned on
    // the pool subtree directly — the greedy rounds lazily checkpoint,
    // which truncates this stage out of the final executedPlan.
    val pp = plan(Similarity.mmrPool(emb, emb.filter(col("vec_id") < 2),
      poolSize = 24))
    assert(pp.contains("ObjectHashAggregate"), pp)
    assert(pp.contains("partial_top_k") || pp.contains("partial_topkbyscore")
      || pp.toLowerCase.contains("partial"), pp)
    assert(!pp.contains("CartesianProduct"), pp)
    // the greedy rounds are checkpoint-truncated: the final plan reads
    // each round's materialized picks (k ExistingRDD leaves unioned),
    // never re-deriving the pool — the 2^k subtree explosion is gone
    val p = plan(Similarity.mmrSelect(emb, emb.filter(col("vec_id") < 2),
      k = 3))
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("ObjectHashAggregate"),
      s"greedy rounds re-derive the pool instead of reading checkpoints:\n$p")
  }

  test("zoneMap is one keyed aggregate — no join, no window, no global sort") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val p = plan(Layout.zoneMap(ev, expr("event_id div 1024"),
      graft.util.Cols.epochUs(col("ts")), 0L, 1L, col("user_id"), 0L, 1L))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial+final
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
  }

  test("cusum windows run on the rolled-up minute series, keyed by type") {
    import org.apache.spark.sql.execution.window.WindowExec
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val df = TimeSeries.cusumChangepoints(ev)
    // raw events reduce through a keyed (type, minute) aggregate FIRST
    val p = plan(df)
    assert(p.contains("date_trunc") || p.contains("minute"), p)
    // every window partitions by event_type — none global
    val wins = df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w.partitionSpec.isEmpty }
    assert(wins.nonEmpty && wins.forall(_ == false),
      s"unpartitioned cusum window: $wins")
  }

  test("threshold sweep: the only window runs over the bucket histogram") {
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val df = Dedup.jaccardThresholdSweep(docs)
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    // one unpartitioned window is allowed — it sorts ≤ buckets+1 rows
    // (the histogram), bounded by the operator parameter, never by data
    assert(wins.length == 1, s"windows: ${wins.length}")
    // and it must sit ABOVE the bucket aggregate (plans print
    // top-down, so the window appears before the aggregate), i.e. it
    // consumes the histogram, not the pair stream
    val p = plan(df)
    assert(p.indexOf("Window") < p.indexOf("HashAggregate"), p)
  }

  test("co-occurrence projection joins on the group key only") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    // hot-group exclusion rides an anti-join, not a count window —
    // pinned on the capped-relation stage directly (the pair stage
    // lazily checkpoints it, truncating it out of the final plan)
    val ps = plan(Graph.cappedGroupItems(ev,
      date_trunc("hour", col("ts")), col("user_id"), 1024L))
    assert(ps.contains("LeftAnti"), ps)
    assert(!ps.contains("Window"), ps)
    val p = plan(Graph.cooccurrenceEdges(ev,
      date_trunc("hour", col("ts")), col("user_id"), minShared = 2L))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    // the self-join reads the SAME materialized blocks on both sides
    assert(p.contains("ExistingRDD"), p)
  }

  test("ewma: the 8 lag terms share one user-keyed window — none global") {
    import org.apache.spark.sql.execution.window.WindowExec
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val df = TimeSeries.ewmaSmooth(ev)
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.length == 1, s"windows: ${wins.length}")
    assert(wins.forall(_.partitionSpec.nonEmpty), "global ewma window")
  }

  test("seasonal profile: keyed agg + broadcast total, no window") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val p = plan(TimeSeries.seasonalProfile(ev))
    assert(!p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial+final
    assert(p.contains("BroadcastExchange"), p)          // 1-row total
  }

  test("kmeans: centroids broadcast each round; no corpus self-join") {
    val emb = ChangeLogSource.table(spark, sfDir, "embeddings")
    // checkpointFinal=false exposes the full Lloyd lineage to the plan
    val p = plan(Similarity.kmeansAssign(emb, k = 4, iters = 2,
      checkpointFinal = false))
    // every join in the loop is an equi-join with a broadcast build
    // side (k*dim centroid rows / vec->cluster assignment / sizes)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("k-anonymity: one keyed aggregate over metadata, no window") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(TextOps.kAnonymity(docs))
    assert(!p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("seasonal anomalies: cell stats broadcast, events never sort-merge") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val p = plan(TimeSeries.seasonalAnomalies(ev))
    assert(p.contains("BroadcastHashJoin"), p) // <=168 cells build side
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("sample-sum audit: one aggregate pass, no join, no window") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
    val p = plan(Sketches.sampleSumAudit(ev, "event_type", "event_id",
      floor(col("value") * 1048576.0).cast("long")))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial+final
  }

  test("k-anonymity ladder: constant explode fan-out + keyed aggregates") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(TextOps.kAnonymityLadder(docs))
    assert(p.contains("Generate"), p) // ladder explode, |widths| fan-out
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("reconcile: one scan, one keyed aggregate pair, no join/window") {
    val ev = ChangeLogSource.table(spark, sfDir, "events")
      .withColumn("action", graft.sources.AuditLogGenerator.action)
    val p = plan(CdcOps.reconcileSnapshots(ev,
      graft.util.Cols.tsLit(ev, "ts", "2024-01-10 00:00:00"),
      graft.util.Cols.tsLit(ev, "ts", "2024-01-20 00:00:00")))
    // both per-point states fold in ONE pass: no snapshot self-join,
    // no window sort; conditional max_by = partial+final SortAggregate
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert("SortAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("sequence packing: shard-keyed window only, no global data sort") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(TextOps.packSequences(docs))
    // position + running offset ride ONE window, partitioned by shard
    // (the only Sort preceding it is the window's per-shard sort; the
    // trailing rangepartitioning sort is the output-order convention)
    assert("Window".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning(shard"), p)
    assert(!p.contains("Join"), p)
  }

  test("distilled corpus build: one plan, broadcasts everywhere, no cartesian") {
    val p = plan(graft.SparkEntry.queries("pipeline_distilled_corpus")(
      spark, sfDir))
    // the NB model joins and the per-source rate join all broadcast;
    // the single-row totals ride broadcast nested loops; nothing
    // data-sized cross-joins
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("crawl-ingest stages: html/url normalize are pure narrow maps; url dedup is one partial-agg shuffle") {
    // the two normalize queries: scan-bound claims must be visible —
    // the ONLY exchange is the output-order convention's final range
    // partitioning; no join, no window, no hash shuffle
    for (q <- Seq("text_html_extract", "text_url_normalize")) {
      val p = plan(graft.SparkEntry.queries(q)(spark, sfDir))
      assert(!p.contains("hashpartitioning"), s"$q shuffles:\n$p")
      assert(!p.contains("Join") && !p.contains("Window"), s"$q:\n$p")
    }
    // url dedup: the groupBy aggregates map-side (partial_count +
    // partial_min before the one hash exchange) — at 100 TB the wire
    // carries canonical keys, not documents
    val p = plan(graft.SparkEntry.queries("dedup_url_canonical")(
      spark, sfDir))
    assert(p.contains("partial_count") || p.contains("partial count") ||
      "HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("line dedup: broadcast verdict join — the line side never partitions on the key") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(TextOps.lineDedup(docs))
    // explode feeds a partial-agged key groupBy (distinct keys on the
    // wire), then the hot set — aggregated boilerplate, bounded by
    // repeated-line cardinality — BROADCASTS for the verdict join
    // (r11 verdict #2: the line side must never shuffle on the line
    // key, where the trimmed-empty key would serialize a partition);
    // reassembly is doc-keyed
    // the exploded lines are checkpointed (one evaluation feeds both
    // the df aggregate and the verdict join), so the final plan reads
    // ExistingRDD; the Generate lives in the checkpoint pipeline and
    // is pinned at the explodedLines operator level
    assert(p.contains("ExistingRDD"), p)
    assert(plan(TextOps.explodedLines(docs)).contains("Generate"))
    assert("HashAggregate".r.findAllIn(p).size >= 3, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    // the only key-keyed exchanges are the df-count aggregate's two
    // phases ((key, doc_id) distinct + key rollup); the verdict join
    // adds no single-key exchange of the LINE side
    assert("hashpartitioning\\(key#\\d+, \\d+\\)".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("Window"), p)
  }

  test("crawl flagship: keyed shuffles only — no cartesian, shard-keyed window") {
    val p = plan(graft.SparkEntry.queries("pipeline_crawl_manifest")(
      spark, sfDir))
    // url-survivor semi-join, line-df join, doc reassembly, shard
    // window — every stage keyed; the only Window partitions by shard
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning(shard"), p)
    assert("Window".r.findAllIn(p).size == 1, p)
  }

  test("robots queries: host-keyed everything — no cartesian, no corpus-sized window") {
    for (q <- Seq("crawl_robots_rules", "crawl_robots_allowed")) {
      val p = plan(graft.SparkEntry.queries(q)(spark, sfDir))
      // parse windows ride (host, ln) over a robots FILE's lines;
      // agent selection windows ride host; the admit decision is a
      // host-keyed join + array expressions — nothing data-sized
      // sorts or windows, nothing cross-joins
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      val winSpecs = p.linesIterator
        .filter(_.contains("windowspecdefinition(")).toSeq
      assert(winSpecs.nonEmpty, s"$q:\n$p")
      assert(winSpecs.forall(_.contains("host#")),
        s"$q:\n" + winSpecs.mkString("\n"))
    }
  }

  test("canonical-identity dedup: one partial-agged groupBy, no join, no window") {
    val p = plan(graft.SparkEntry.queries("dedup_canonical_identity")(
      spark, sfDir))
    // key derivation is a narrow map over the page join; the dedup
    // itself is ONE hash-groupBy with map-side partials — the wire
    // carries identity keys, never pages
    assert("hashpartitioning".r.findAllIn(p).size <= 2, p) // key agg + output range
    assert(!p.contains("CartesianProduct") && !p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("ingest flagship: keyed shuffles only, in-plan byte edge, shard-keyed window") {
    val p = plan(graft.SparkEntry.queries("pipeline_frontier_manifest")(
      spark, sfDir))
    // robots admit join + canonical-survivor semi-join + decode
    // (typed mapPartitions, IN-plan — the byte edge is not a
    // side-channel) + line-df broadcast join + doc reassembly + shard
    // window — every stage keyed or broadcast; no cartesian anywhere.
    // Windows exist only in the robots PARSE (host-keyed — a robots
    // file's lines, never corpus-sized) and the shard manifest; none
    // may be global or doc-keyed
    assert(!p.contains("CartesianProduct"), p)
    // the decode byte edge (typed MapPartitions) now materializes
    // inside lineDedup's exploded-lines checkpoint, so it no longer
    // prints in the FINAL plan; its in-plan-ness is pinned at the
    // operator level (HtmlBytesSpec) and the
    // checkpoint read shows up here as ExistingRDD
    assert(p.contains("ExistingRDD"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("hashpartitioning(shard"), p)
    val winSpecs = p.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(winSpecs.nonEmpty, p)
    assert(winSpecs.forall(l => l.contains("host#") || l.contains("shard")),
      winSpecs.mkString("\n"))
  }

  test("recrawl flagship: host-keyed windows only, no cartesian, keyed aggs") {
    val df = graft.SparkEntry.queries("pipeline_recrawl_manifest")(
      spark, sfDir)
    val p = plan(df)
    // sitemap parse is a narrow map; the admit and gap joins are
    // host-keyed (AQE-broadcastable index); the schedule window and
    // the robots parse windows all partition by host; the manifest is
    // one keyed aggregate — nothing corpus-global anywhere
    assert(!p.contains("CartesianProduct"), p)
    keyedWindowsOnly(df)
    val winSpecs = p.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(winSpecs.nonEmpty && winSpecs.forall(_.contains("host#")),
      winSpecs.mkString("\n"))
  }

  test("graph flagship queries: registered plans pinned (the two >5 s rows)") {
    // r12 verdict item 6: graph_link_prediction / graph_cooccur_kcore
    // are the most expensive driver-bench queries; their driver-vs-
    // local deltas were box drift (r13 quiet rep: 5.58 s / 4.83 s at
    // steal 0.224, at local medians), so pin the REGISTERED plans —
    // hub-capped wedge enumeration and the keyed k-core peel must
    // never regress into a pair join or a global sort
    for (q <- Seq("graph_link_prediction", "graph_cooccur_kcore")) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      // one output ordering at most — no data-sized intermediate sort
      assert("rangepartitioning".r.findAllIn(p).size <= 1, s"$q:\n$p")
      // windows (degree caps / top-k) are node-keyed, never global
      keyedWindowsOnly(df)
    }
  }

  test("sitemapResolve: exactly maxDepth store joins, nothing cartesian") {
    // r13 verdict item 7: the nested-index walk is CLOSED BY JOINS —
    // maxDepth=2 in the registered query means exactly two
    // string-keyed equi-joins against the child store (the fixture
    // itself is join-free unions), never a cartesian and never a
    // recursion
    val df = graft.SparkEntry.queries("crawl_sitemap_nested")(
      spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // two LOGICAL store joins; the plan TREE re-embeds them once per
    // downstream union branch (levels 0..2 emit six branches carrying
    // 0+1+1+2+2+2 = 8 join nodes — runtime reuses the exchanges), so
    // the pin is the ceiling plus every join being loc-keyed equi
    val joinLines = p.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")).toSeq
    assert(joinLines.size <= 8,
      s"join tree grew past the maxDepth=2 embedding bound:\n$p")
    assert(joinLines.forall(_.contains("loc#")),
      "a store join is not loc-keyed:\n" + joinLines.mkString("\n"))
  }

  test("revisit classification: ONE url-keyed equi-join, no window") {
    // r13 verdict item 5: stored-validators × fetch-wave is a single
    // keyed join plus narrow expressions — the stream-static-join
    // safe shape
    val df = graft.SparkEntry.queries("crawl_revisit")(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).size
    assert(joins == 1, s"expected one url-keyed join, got $joins:\n$p")
  }

  test("quality-gate flagship: model joins broadcast, no cartesian") {
    // r13 verdict item 6: the 1024-row weight vector and the
    // single-row intercept broadcast; decile offsets broadcast; the
    // only data-sized shuffles are the gram aggregate, the gate
    // aggregate and the manifest — nothing cross-joins data-sized
    // frames (single-row totals ride broadcast nested loops by
    // design, so only CartesianProduct is banned)
    val df = graft.SparkEntry.queries("pipeline_quality_gate")(
      spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("archive family: file/writer-keyed windows, broadcast wanted set") {
    // the CDX index's one window partitions by capture file, the
    // segment packer's by writer — never corpus-global; the fetch
    // plan's wanted set rides a BROADCAST semi-join and its two
    // interval-merge windows share the file partitioning (one
    // exchange, not two)
    for (q <- Seq("crawl_cdx_index", "crawl_cdx_fetch_plan",
        "pipeline_archive_manifest")) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      keyedWindowsOnly(df)
    }
    val fp = plan(graft.SparkEntry.queries("crawl_cdx_fetch_plan")(
      spark, sfDir))
    // the wanted-set join must stay a SEMI join — an inner join here
    // would duplicate index rows per wanted match
    assert(fp.contains("LeftSemi"), fp)
  }

  test("lm filter: type-table joins, single-row total broadcast, no windows") {
    // lmScoreHeldout's only data-sized work is the two token-stream
    // aggregates; the LM joins are keyed (type tables), the corpus
    // total is a 1-row broadcast (BNLJ is fine THERE and nowhere
    // else), and nothing windows or cartesians
    for (q <- Seq("text_lm_heldout", "pipeline_ccnet_buckets")) {
      val p = plan(graft.SparkEntry.queries(q)(spark, sfDir))
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("Window"), s"$q:\n$p")
      assert(p.contains("BroadcastExchange"), s"$q:\n$p")
    }
  }

  test("nb classifier: vocab model broadcasts, totals broadcast, no cartesian") {
    val docs = ChangeLogSource.table(spark, sfDir, "documents")
    val p = plan(TextOps.nbClassifier(docs))
    // the score-side model join is a broadcast hash join (the model is
    // vocabulary-sized); the single-row totals ride broadcast nested
    // loops; nothing data-sized ever cross-joins, and no window runs
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }
}

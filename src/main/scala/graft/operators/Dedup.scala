package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines over `documents`.
 *
 * Scale notes (the point of each design):
 *  - Exact dedup groups on a 128-bit digest, not the raw text: the
 *    shuffle moves 16-byte keys, not documents.
 *  - Heavy derived values (token array, shingle set, minhash signature)
 *    are materialized as real columns in separate projections, never
 *    re-inlined per use — Catalyst's CollapseProject keeps non-cheap
 *    aliases as separate stages, so each is computed once per row.
 *  - Pair similarity is computed by exploding shingle digests and
 *    counting shared digests per pair (shuffle keys are 8-byte hashes),
 *    not by joining full shingle arrays and intersecting them — work is
 *    proportional to actual collisions, never O(n²·|shingles|²).
 *  - All hashing is `xxhash64` (codegen'd, seedable); no UDFs.
 */
object Dedup {

  /** Content key for exact dedup: md5 of whitespace-normalized text. */
  def contentKey(text: Column): Column = TextOps.fingerprint(text)

  /**
   * Exact dedup groups: one row per distinct (normalized) content with
   * the survivor (min doc_id) and the duplicate count. The groupBy
   * shuffles only (digest, doc_id).
   */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.select(contentKey(col("text")).as("content_key"), col("doc_id"))
      .groupBy("content_key")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup: keep the min-doc_id survivor per distinct content. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_key")).orderBy(col("doc_id"))
    docs.withColumn("content_key", contentKey(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "content_key")
  }

  /**
   * Streaming exact dedup with BOUNDED state — the ingestion-time
   * variant of [[exactDedup]] for a continuously arriving corpus: each
   * document's content key (md5 of normalized text) is checked against
   * keys seen within the event-time watermark horizon and duplicates
   * are dropped; state for keys older than `delay` is evicted by the
   * engine, so state size tracks the arrival rate × window, never the
   * corpus (an unbounded `dropDuplicates` would OOM a year-long
   * stream). Trade-off, stated: a duplicate arriving after its
   * original has aged past the watermark is re-admitted — at 100 TB
   * the horizon-bounded stream dedup runs in front of the periodic
   * batch [[exactDedup]]/[[nearDuplicatePairs]] compaction, catching
   * the dominant near-in-time duplicate mass (crawl re-fetches,
   * mirror bursts) at constant memory.
   */
  def streamingDedup(docs: DataFrame, delay: String,
                     tsCol: String = "event_time"): DataFrame =
    docs.withColumn("content_key", contentKey(col("text")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_key")

  /**
   * `(doc_id, sh)` where `sh` is the deduplicated word-`k`-shingle set
   * of the normalized text. Three stacked projections so the token
   * array is computed once and the shingle array once.
   */
  def shingleSets(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
                  textCol: String = "text",
                  carry: Seq[String] = Nil): DataFrame =
    // one-pass custom expression: the interpreted
    // transform(sequence)/slice/concat_ws/array_distinct composition it
    // replaces dominated every shingle-based operator (each lambda
    // element re-evaluated interpreted, ~2s of a 3s query at sf0.1).
    // `carry` threads extra columns through unchanged (the streaming
    // screen carries its event-time column).
    docs.select(col(idCol) +: carry.map(col) :+
      graft.functions.functions.word_shingles(
        TextOps.normalized(col(textCol)), k).as("sh"): _*)

  /**
   * MinHash signature from a shingle-set column: sigⱼ = min over
   * shingles of (aⱼ·h60(s) + bⱼ) mod 2³¹−1 — the h60 family, so a
   * DuckDB oracle can recompute the identical signature from SQL
   * builtins. One narrow map stage via the custom
   * [[graft.functions.MinHash60Expr]] expression — a single JVM loop
   * per row instead of `perms` interpreted higher-order passes.
   * (The raw-throughput xxhash64 variant remains available as
   * [[graft.functions.functions.minhash_signature]].)
   */
  def minhashSignature(sh: Column, perms: Int = 32): Column =
    graft.functions.functions.minhash60(sh, perms)

  /**
   * LSH banding: split the signature into `bands` bands of
   * `perms/bands` rows each and hash each band — documents sharing any
   * band hash become candidates. Returns (doc_id, band, bucket) rows.
   */
  def lshBuckets(docs: DataFrame, perms: Int = 32, bands: Int = 8,
                 k: Int = 3, carry: Seq[String] = Nil): DataFrame = {
    shingleSets(docs, k, carry = carry)
      .select(col("doc_id") +: carry.map(col) :+
        minhashSignature(col("sh"), perms).as("sig"): _*)
      .select(col("doc_id") +: carry.map(col) :+
        posexplode(graft.functions.functions.lsh_bands(col("sig"), bands))
          .as(Seq("band", "bucket")): _*)
  }

  /**
   * Candidate near-duplicate pairs from LSH: self-join on (band,
   * bucket), keeping a < b. The join shuffles 8-byte bucket keys; pair
   * work is proportional to collisions, not n². `distinct` collapses
   * pairs colliding in several bands.
   */
  def lshCandidatePairs(docs: DataFrame, perms: Int = 32, bands: Int = 8,
                        k: Int = 3): DataFrame = {
    // Self-join with IDENTICAL child plans (alias only at the join) so
    // ReuseExchange evaluates the bucket subtree once instead of twice.
    // (A checkpoint here was measured SLOWER end to end — the bucket
    // table's materialization copy costs more than the reuse saves,
    // and the construction-time job serializes consumers' stages:
    // r14 A/B on the nearDuplicatePairs family, −25% after revert.)
    val b = lshBuckets(docs, perms, bands, k)
    b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /**
   * Incremental near-dedup: screen an arriving `batch` against the
   * standing `corpus` WITHOUT re-pairing the corpus against itself —
   * the shape that makes continuous ingestion affordable at 100 TB.
   * The batch's LSH band buckets join the corpus's band buckets
   * (A×B, never the A×A self-join of [[lshCandidatePairs]]), so work
   * scales with |batch|·collisions; the corpus bucket table is the
   * persisted index a production pipeline writes once per compaction
   * and bucket-partitions on (band, bucket) so each ingest joins
   * co-located. Candidates are verified by exact shingle Jaccard ≥
   * `threshold`, then rolled up to one verdict row per duplicate
   * batch document: its best-matching corpus twin (highest Jaccard,
   * min-id tie-break), the matched similarity, and how many corpus
   * near-twins it has. Batch docs with no match produce no row —
   * absence ≡ novel, the same absence-semantics as the delete-aware
   * mirror.
   */
  def incrementalNearDups(corpus: DataFrame, batch: DataFrame,
                          threshold: Double = 0.5, perms: Int = 32,
                          bands: Int = 8, k: Int = 3): DataFrame = {
    val cb = lshBuckets(corpus, perms, bands, k)
    val bb = lshBuckets(batch, perms, bands, k)
    val cands = bb.as("x").join(cb.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket"))
      .select(col("x.doc_id").as("batch_id"),
        col("y.doc_id").as("corpus_id"))
      .distinct()
    val shB = shingleSets(batch, k)
      .select(col("doc_id").as("batch_id"), sort_array(col("sh")).as("sh_b"))
    val shC = shingleSets(corpus, k)
      .select(col("doc_id").as("corpus_id"), sort_array(col("sh")).as("sh_c"))
    cands.join(shB, "batch_id").join(shC, "corpus_id")
      .select(col("batch_id"), col("corpus_id"),
        sortedJaccard(col("sh_b"), col("sh_c")).as("jac"))
      .filter(col("jac") >= threshold)
      .groupBy(col("batch_id"))
      .agg(
        max_by(col("corpus_id"),
          struct(col("jac"), (-col("corpus_id")).as("nc"))).as("dup_of"),
        max(col("jac")).as("best_jaccard"),
        count(lit(1)).as("n_matches"))
      .orderBy(col("batch_id"))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(1.0)).otherwise(inter / union)
  }

  /** [[jaccard]] over arrays the CALLER has already sorted (binary
    * `sort_array` order): one linear codegen merge per pair instead of
    * array_intersect's per-pair hash-set build. Sort once per document
    * before the candidate join — each document appears in many
    * candidate pairs, so the sort amortizes while the merge runs per
    * pair (the same kernel economics as [[ppjoinExactPairs]]). */
  def sortedJaccard(a: Column, b: Column): Column = {
    val inter = graft.functions.functions.sorted_intersect_size(a, b)
      .cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(1.0)).otherwise(inter / union)
  }

  /**
   * MinHash near-dedup, verified: LSH candidates re-checked with exact
   * shingle Jaccard ≥ `threshold`. Shingle arrays are joined only for
   * candidate doc_ids — the heavy payload never moves for
   * non-candidates.
   */
  def nearDuplicatePairs(docs: DataFrame, threshold: Double = 0.5,
                         perms: Int = 32, bands: Int = 8, k: Int = 3): DataFrame = {
    // sorted once per document (not per candidate pair) so the exact
    // verification is the linear sorted-merge kernel. NOT checkpointed:
    // materializing the fat shingle arrays was measured slower than
    // evaluating the narrow shingle scan twice (r14 A/B, same finding
    // as the bucket table above) — the array copy IS the cost here.
    val sh = shingleSets(docs, k)
      .select(col("doc_id"), sort_array(col("sh")).as("sh"))
    val cands = lshCandidatePairs(docs, perms, bands, k)
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        sortedJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * MinHash estimate vs exact Jaccard, per LSH-candidate pair — the
   * similarity member of the sketch-accuracy trilogy (HLL→NDV,
   * AMS→join size, MinHash→Jaccard): signature agreement
   * `matches/perms` is the estimator the banded index acts on; this
   * audit puts it next to the exact shingle Jaccard with a signed
   * ppm error, over exactly the pairs the pipeline would verify
   * (LSH candidates — the operative population, biased toward high
   * similarity, which is where threshold decisions live). Expected
   * |error| ≈ √(J(1−J)/perms) ≈ 9 ppt at perms=32, J=0.5 — the
   * number that justifies (or refuses) skipping exact verification.
   *
   * All integer: matches ≤ perms, the error clears denominators as
   * `matches·uni − perms·inter` over `perms·uni`, sign-split ppm.
   *
   * Scale shape: identical to [[nearDuplicatePairs]] — candidates
   * from the banded join (∝ collisions), shingle arrays and
   * signatures joined only for candidate ids, the agreement count a
   * 32-element zip per pair.
   */
  def minhashAccuracy(docs: DataFrame, perms: Int = 32, bands: Int = 8,
                      k: Int = 3): DataFrame = {
    // sign the corpus ONCE: sorted shingles + signature materialized
    // together (the persisted signature table a production pipeline
    // keeps); banding, the candidate join, and both pair sides read
    // the checkpoint — a lshCandidatePairs call here would re-run the
    // 32-permutation MinHash kernel over the whole corpus a second
    // time (its bucket projection defeats ReuseExchange)
    val base = shingleSets(docs, k).select(col("doc_id"),
        sort_array(col("sh")).as("sh"),
        minhashSignature(col("sh"), perms).as("sig"))
      .localCheckpoint()
    val buckets = base.select(col("doc_id"),
        posexplode(graft.functions.functions.lsh_bands(col("sig"), bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val cands = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("sig").as("sig_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y)," +
          " z -> z)) as bigint)").as("matches"),
        graft.functions.functions.sorted_intersect_size(
          col("sh_a"), col("sh_b")).cast("long").as("inter"),
        (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("sz"))
      .select(col("doc_a"), col("doc_b"), col("matches"), col("inter"),
        (col("sz") - col("inter")).as("uni"))
      .select(col("doc_a"), col("doc_b"), col("matches"), col("inter"),
        col("uni"),
        expr(s"(matches * 1000000) div $perms").as("est_ppm"),
        expr("(inter * 1000000) div uni").as("exact_ppm"),
        (signum(expr(s"matches * uni - $perms * inter")).cast("long") *
          expr(s"(abs(matches * uni - $perms * inter) * 1000000)" +
            s" div ($perms * uni)")).as("err_ppm"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /**
   * N-gram Jaccard similarity of every pair sharing at least one
   * shingle — the explicit (non-MinHash) near-dup path. Shingles are
   * exploded to 8-byte digests; shared-shingle counts come from a
   * digest-keyed join + count aggregation, so the per-pair cost is a
   * counter, not an array intersection. (A collect_list-per-digest
   * variant benchmarks ~5% faster warm but buffers each digest's full
   * document list in one aggregation buffer — a hot digest OOMs it at
   * scale, while this join streams its pairs; measured and rejected.)
   */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5,
                        k: Int = 3, maxDf: Int = 64): DataFrame =
    ngramPairStats(docs, k, maxDf)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Shared candidate machinery of [[ngramJaccardPairs]] and
    * [[jaccardThresholdSweep]]: every pair sharing ≥ 1 post-cap
    * shingle, with the exact integer triple (|a∩b|, |a|, |b|). */
  private def ngramPairStats(docs: DataFrame, k: Int,
                             maxDf: Int): DataFrame = {
    val sh = shingleSets(docs, k)
    // explode first, hash after: xxhash64 on the exploded column runs
    // inside whole-stage codegen, where hashing inside a transform()
    // lambda would evaluate interpreted per element.
    // The exploded digest stream is referenced four times below (the
    // hot-gram count, the per-doc sizes, both self-join sides) and
    // exchange reuse does not fire across them (different pushed
    // filters — the cooccurrenceEdges finding; verified 8 scans /
    // 0 reuse on the executed bench plan): lazy checkpoints pin the
    // shingle+hash pipeline to ONE evaluation.
    val ex0 = sh.select(col("doc_id"), explode(col("sh")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("g"))
      .localCheckpoint(true)
    // Stop-gram cap (same discipline as containmentPairs): a shingle
    // present in more than `maxDf` documents (boilerplate — "one of
    // the") is non-discriminative and alone contributes O(df²) join
    // pairs on one 8-byte key. Drop it before the self-join; Jaccard
    // is then a true Jaccard of each document's DISCRIMINATIVE
    // shingles (sizes recomputed post-cap). Without this cap one
    // corpus-frequent trigram is a quadratic blowup at 100 TB.
    // Shape: the hot-digest list is a partial-aggregating groupBy
    // (tiny result — only boilerplate grams exceed the cap) anti-
    // joined back, so the exploded set is never shuffled just to be
    // counted (a count-over-window here would re-shuffle everything).
    val hot = ex0.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("g"))
    val ex = ex0.join(hot, Seq("g"), "left_anti")
      .localCheckpoint(true)
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // the digest self-join explodes up to maxDf× — spread the stream
    // side before the explosion (the AQE pre-join-bytes coalescing
    // trap, see Graph.cooccurrenceEdges)
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    val inter = ex.repartition(nPart, col("g")).as("a")
      .join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      // per-document aggregate: sized like the corpus, so no broadcast
      // hint — AQE picks broadcast only when it genuinely fits
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("inter"),
        col("n_a"), col("n_b"))
  }

  /**
   * Threshold-sensitivity sweep for near-dedup: the Jaccard histogram
   * of EVERY candidate pair (≥ 1 shared post-cap shingle), in
   * `buckets` integer-exact bins `⌊buckets·|a∩b| / |a∪b|⌋`, plus the
   * cumulative pair count at-or-above each bin — i.e. for every
   * candidate threshold t = bucket/buckets, how many pairs a dedup at
   * t would collapse. This is the plot an engineer reads BEFORE
   * choosing the production threshold: genuine near-dup corpora show
   * a bimodal histogram (a boilerplate hump near 0, a true-duplicate
   * spike near 1) and the threshold goes in the valley; a unimodal
   * smear means the shingle length or the df cap needs revisiting,
   * not the threshold.
   *
   * Integer-exact everywhere (the bin is `(buckets·inter) div uni` —
   * no double ever forms), so the oracle replays it bit-for-bit.
   *
   * Scale shape: identical to [[ngramJaccardPairs]] (same capped
   * candidate machinery) up to the pair stats, then a ≤ buckets+1-row
   * aggregate; the cumulative sum is a window over that always-small
   * frame (bounded by `buckets`, never by data).
   */
  def jaccardThresholdSweep(docs: DataFrame, k: Int = 3, maxDf: Int = 64,
                            buckets: Int = 20): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, s"buckets=$buckets")
    val hist = ngramPairStats(docs, k, maxDf)
      .select(expr(s"($buckets * inter) div (n_a + n_b - inter)")
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
    hist.withColumn("pairs_ge",
        sum(col("n_pairs")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .orderBy(col("bucket"))
  }

  /**
   * Candidate pairs under PPJoin-style prefix filtering (Xiao et al.,
   * WWW'08): order each document's shingles by GLOBAL rarity
   * (df ascending, shingle ascending); a document of size `s` under
   * Jaccard threshold `t = tNum/tDen` keeps only its first
   * `s − ⌈t·s⌉ + 1` rarest shingles as its prefix; two documents can
   * reach `J ≥ t` only if their PREFIXES share a shingle (if a's
   * intersection avoided a's prefix it would fit in the suffix of
   * size `⌈t·s⌉ − 1 < ⌈t·s⌉ ≤ |a∩b|` — contradiction). LOSSLESS, and
   * the inverse of the `maxDf` stop-gram cap: corpus-frequent
   * boilerplate shingles sort to the END of the rarity order and fall
   * outside every non-trivial prefix, so the self-join keys are
   * precisely the low-df shingles whose collision lists are short —
   * candidate work tracks rare-shingle collisions, never df² on a hot
   * gram.
   */
  def ppjoinCandidatePairs(docs: DataFrame, tNum: Int, tDen: Int,
                           k: Int = 3): DataFrame =
    ppjoinCandidatesFrom(shingleSets(docs, k), tNum, tDen)

  /** [[ppjoinCandidatePairs]] over an already-built (doc_id, sh)
    * shingle frame — lets [[ppjoinExactPairs]] share ONE materialized
    * shingle pass between filtering and verification. */
  private def ppjoinCandidatesFrom(sh: DataFrame, tNum: Int,
                                   tDen: Int): DataFrame = {
    require(tNum > 0 && tDen >= tNum, s"threshold $tNum/$tDen")
    // set size carried from the array — no per-doc count aggregate,
    // no size join (one exchange fewer than the textbook pipeline)
    val ex = sh.select(col("doc_id"), size(col("sh")).cast("long").as("sz"),
      explode(col("sh")).as("g"))
    val df = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // per-doc rarity rank: window partitions by document (bounded
    // frames), order by the global (df, shingle) — deterministic and
    // oracle-replayable
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("g"))
    val prefix = ex.join(df, "g")
      .withColumn("rnk", row_number().over(w))
      // ⌈t·s⌉ = (tNum·s + tDen − 1) div tDen, all integer
      .filter(col("rnk") <=
        col("sz") - expr(s"(sz * $tNum + ${tDen - 1}) div $tDen") + 1)
      .select(col("doc_id"), col("g"), col("sz"), col("rnk"))
      // both self-join sides read the prefix ranking — checkpoint so
      // the df join + window run once, not twice (exchange reuse does
      // not fire across the differently-filtered sides)
      .localCheckpoint(true)
    // prefix-shingle collision + PPJoin length filter: J ≥ t forces
    // t·max(|a|,|b|) ≤ min(|a|,|b|) (J ≤ min/max), so size-mismatched
    // collisions die BEFORE the distinct — measured 409k → 310k
    // candidate pairs on the sf0.1 corpus at t = 1/2.
    //
    // PPJoin POSITIONAL filter (Xiao et al. §3.2) on top: both
    // documents order shingles by the same global (df, shingle) rank,
    // so for the EARLIEST collision (positions i, j) the overlap is
    // bounded by 1 + min(|a|−i, |b|−j); J ≥ t needs overlap ≥
    // ⌈t·(|a|+|b|)/(1+t)⌉ = ⌈tNum·(sza+szb)/(tNum+tDen)⌉. Taking
    // max(bound) over a pair's collisions equals the earliest
    // collision's bound (positions smallest ⇒ bound largest), so
    // `max(bound) ≥ α` is LOSSLESS — it keeps every pair the
    // first-collision filter keeps — while killing pairs whose only
    // collisions sit at the tails of both prefixes (no room left for
    // the required overlap) before their full shingle arrays are ever
    // joined or merged.
    val ubound = lit(1L) +
      least(col("a.sz") - col("a.rnk"), col("b.sz") - col("b.rnk"))
    // the prefix self-join explodes per-digest — spread the stream
    // side before the explosion (the AQE pre-join-bytes trap, see
    // Graph.cooccurrenceEdges)
    val nPart = sh.sparkSession.sessionState.conf.numShufflePartitions
    prefix.repartition(nPart, col("g")).as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * tNum <= col("b.sz") * tDen &&
          col("b.sz") * tNum <= col("a.sz") * tDen)
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(max(ubound).as("ub"),
        max(col("a.sz")).as("sza"), max(col("b.sz")).as("szb"))
      .filter(col("ub") * (tNum + tDen) >=
        (col("sza") + col("szb")) * tNum)
      .select(col("doc_a"), col("doc_b"))
  }

  /**
   * EXACT set-similarity self-join: every pair with shingle Jaccard
   * ≥ tNum/tDen — no LSH probability, no stop-gram truncation — via
   * [[ppjoinCandidatePairs]] prefix filtering plus exact verification
   * on the candidates only (shingle arrays join BY ID for candidate
   * pairs; non-candidates never move). The lossless alternative to
   * [[ngramJaccardPairs]]'s `maxDf` cap: that one bounds worst-case
   * work by redefining the measure over discriminative shingles; this
   * one keeps the true measure and bounds work by the prefix-filter
   * guarantee. Spec-pinned equal to the brute-force all-pairs join.
   *
   * Pipeline ordering at scale: run [[exactDedup]] FIRST. Candidate
   * work (like the true output) is quadratic in per-content copy
   * multiplicity — m exact copies of one document are C(m,2) genuine
   * result pairs, so no filter can remove them. Collapsing exact
   * copies before the join (and fanning pair results back out through
   * the exact groups if copy-level pairs are needed) is the standard
   * exact-then-near dedup order; ScaleCheck's boilerplate probe runs
   * the composition.
   */
  def ppjoinExactPairs(docs: DataFrame, tNum: Int, tDen: Int,
                       k: Int = 3): DataFrame = {
    // ONE shingle pass: the normalize+shingle subtree feeds the df
    // count, the size count, the prefix ranking, AND both sides of
    // the verification join — five evaluations without this (measured
    // 7.9 s → ~3 s at sf0.1). Same materialize-once discipline as
    // bfsHops / nearDupComponents. Arrays sorted HERE, once per
    // document, so verification is a linear sorted merge per candidate
    // pair (sorted_intersect_size) instead of array_intersect's
    // per-pair hash-set build — the verify kernel was 105 s CPU of the
    // whole 182-query bench before this.
    val sh = shingleSets(docs, k)
      .select(col("doc_id"), sort_array(col("sh")).as("sh"))
      .localCheckpoint()
    val inter = graft.functions.functions
      .sorted_intersect_size(col("sh_a"), col("sh_b"))
    val uni = (size(col("sh_a")) + size(col("sh_b"))).cast("long") - inter
    ppjoinCandidatesFrom(sh, tNum, tDen)
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        "doc_b")
      // threshold test on cross-multiplied integers — engine-exact
      .filter(inter * tDen >= uni * tNum)
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") / uni.cast("double")).as("jaccard"))
  }

  /**
   * Containment / overlap pairs from winnowing fingerprints: documents
   * sharing ≥ `minShared` sampled rolling-hash fingerprints, scored by
   * `shared / min(|fps_a|, |fps_b|)` — 1.0 means the smaller document's
   * sampled content is fully contained in the other (the
   * Schleimer-Wilkerson-Aiken winnowing use case: clone and
   * quote-inclusion detection, which whole-document Jaccard misses).
   * Joins 8-byte fingerprints, so pair work tracks true fingerprint
   * collisions, and the text itself never moves.
   */
  def containmentPairs(docs: DataFrame, k: Int = 8, mod: Int = 4,
                       minShared: Int = 8, maxDf: Int = 50): DataFrame = {
    val fps = docs.select(col("doc_id"),
      TextOps.rollingFingerprints(col("text"), k, mod).as("fps"))
    val ex = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
    // Stop-gram removal: a fingerprint present in more than `maxDf`
    // documents (boilerplate, common phrases) is non-discriminative
    // and would alone contribute O(df²) pairs — the standard winnowing
    // cap that keeps pair volume proportional to real overlap.
    // Containment is then measured over discriminative fingerprints.
    // Hot list via partial-agg groupBy + anti-join (broadcast-tiny),
    // not a count-over-window that would shuffle every exploded row.
    val hot = ex.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("fp"))
    // kept is read three times (sizes + both self-join sides): one
    // materialization; and the fp self-join explodes up to maxDf× —
    // spread the stream side (the AQE pre-join-bytes trap)
    val kept = ex.join(hot, Seq("fp"), "left_anti")
      .localCheckpoint(true)
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    kept.repartition(nPart, col("fp")).as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      // no broadcast hint: `sizes` is one row per document — corpus
      // cardinality — so forcing it driver-side would not survive
      // scale; AQE broadcasts automatically when it actually fits
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("containment"))
  }

  /**
   * Connected components over a near-duplicate pair graph — the dedup
   * CLUSTERS: every document in a component is transitively a near-dup
   * of the others, and min(doc_id) per component is the canonical
   * survivor. Iterative min-label propagation: each round every vertex
   * takes the smallest label among itself and its neighbors, converging
   * in O(component diameter) rounds (each round one shuffle). The
   * driver loop stops when a round changes nothing — the same
   * fixed-point a recursive-CTE oracle computes. At 100 TB swap the
   * per-round full propagation for the large-star/small-star variant;
   * the round structure and convergence test are identical.
   */
  def nearDupComponents(pairs: DataFrame, maxRounds: Int = 32): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // localCheckpoint each round: iterative self-reference would
    // otherwise double the logical plan every iteration (exponential
    // lineage -> analyzer OOM), and the (possibly expensive) pair
    // pipeline feeding `edges` must run once, not once per round.
    // Production clusters would use reliable checkpointing to a
    // checkpoint dir instead.
    val edgesCk = edges.localCheckpoint(true)
    // labelsCk is ALWAYS the checkpoint-backed frame itself (release
    // pattern-matches the plan root, so a projection wrapper would
    // silently defeat it); the id/label projection is re-derived
    var labelsCk = edgesCk.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var labels = labelsCk
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val viaNeighbor = edgesCk
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("label"),
          lit(null).cast("long").as("old"))
      // carry the previous label through the aggregation so
      // convergence is read off `next` directly — no per-round
      // compare join
      val next = labels.select(col("id"), col("label"),
          col("label").as("old"))
        .union(viaNeighbor)
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
        .localCheckpoint(true)
      changed = next.filter(col("label") < col("old")).count()
      // next is materialized (the count above) — release the
      // superseded round so storage is 2 label frames + the pinned
      // edge list, not O(rounds) (r6 verdict item 6)
      graft.util.Checkpoints.release(labelsCk)
      labelsCk = next
      labels = next.select(col("id"), col("label"))
      round += 1
    }
    // a silent partial result would split clusters undetectably —
    // refuse rather than return wrong labels
    if (changed > 0) throw new IllegalStateException(
      s"nearDupComponents did not converge in $maxRounds rounds " +
        s"($changed labels still changing); raise maxRounds")
    // the result references only the final labels checkpoint — the
    // edge list's blocks are dead weight once the loop exits
    graft.util.Checkpoints.release(edgesCk)
    labels.withColumnRenamed("label", "component")
  }

  /**
   * Connected components by alternating large-star/small-star
   * contraction (Kiveris et al., "Connected Components in MapReduce
   * and Beyond", SoCC'14 — a published algorithm, re-expressed as
   * DataFrame rounds) — the 100 TB upgrade over [[nearDupComponents]]'
   * plain min-label propagation:
   *
   *  - label propagation needs O(component diameter) rounds, each a
   *    full-edge shuffle — a chain-shaped dup cluster (common: doc A
   *    near-dups B near-dups C ...) costs rounds proportional to its
   *    LENGTH;
   *  - star contraction converges in O(log n) rounds on any shape,
   *    and each round's keys are the current edge endpoints, which
   *    the contraction itself rebalances (high-degree hubs shed their
   *    neighbors to the component minimum instead of accreting them).
   *
   * Round = large-star (every neighbor LARGER than a node links to
   * the node's neighborhood minimum) then small-star (every neighbor
   * SMALLER links to it, keyed by the larger endpoint). Both steps
   * are groupBy-min + join — one keyed shuffle each, no windows. The
   * fixed point is a forest of stars whose centers are component
   * minima; convergence is detected by an (edge-count, xor-hash)
   * signature and then STRUCTURALLY verified (no node may appear as
   * both a star center and a leaf), so a hash collision cannot fake
   * convergence. Returns the same `(id, component)` contract as
   * [[nearDupComponents]] — min doc_id per component, every endpoint
   * labeled.
   */
  /** Canonical undirected edge set: u < v, no self-loops, distinct. */
  private def canonEdges(df: DataFrame): DataFrame =
    df.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()

  /**
   * One large-star + small-star round over a canonical edge set —
   * exposed (package-private) so the plan spec can assert the round
   * itself is keyed joins + groupBy-min, no window, no cartesian.
   * Identical sibling subtrees (the symmetric edge list, the directed
   * list) feed both the min-aggregate and the re-link join, so
   * ReuseExchange evaluates each once.
   */
  private[operators] def starRound(edges: DataFrame): DataFrame = {
    // large-star: for each node, neighbors above it re-link to the
    // neighborhood minimum (including the node itself)
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .union(edges.select(col("v").as("a"), col("u").as("b")))
    val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mn"))
      .select(col("a"), least(col("mn"), col("a")).as("m"))
    val large = canonEdges(sym.join(mins, "a").filter(col("b") > col("a"))
      .select(col("b").as("u"), col("m").as("v")))
    // small-star: keyed by the LARGER endpoint; it and all its
    // smaller neighbors link to their minimum
    val dir = large.select(col("v").as("a"), col("u").as("b")) // a > b
    val mins2 = dir.groupBy(col("a")).agg(min(col("b")).as("m"))
    canonEdges(
      dir.join(mins2, "a").filter(col("b") =!= col("m"))
        .select(col("b").as("u"), col("m").as("v"))
        .unionByName(mins2.select(col("a").as("u"), col("m").as("v"))))
  }

  def starContractComponents(pairs: DataFrame, maxRounds: Int = 24): DataFrame = {
    var edges = canonEdges(
        pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      .localCheckpoint(true)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = sig(edges)
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // one checkpoint per round: truncates lineage, materializes the
      // (shrinking) edge set once; the superseded round's blocks are
      // released so storage is 2 copies, not O(log n) rounds' worth
      // (r6 verdict item 6)
      val prevEdges = edges
      edges = starRound(edges).localCheckpoint(true)
      val cur = sig(edges)
      graft.util.Checkpoints.release(prevEdges)
      done = cur == prev
      prev = cur
      round += 1
    }
    if (!done) throw new IllegalStateException(
      s"starContractComponents did not converge in $maxRounds rounds")
    // structural star check: a fixed point reached only via signature
    // equality could in principle be a hash collision — verify no id
    // is both a center (u side) and a leaf (v side)
    val nonStar = edges.select(col("u")).distinct()
      .join(edges.select(col("v").as("u")).distinct(), "u").count()
    if (nonStar > 0) throw new IllegalStateException(
      s"starContractComponents: $nonStar non-star centers at fixpoint")
    edges.select(col("v").as("id"), col("u").as("component"))
      .unionByName(edges.select(col("u").as("id"), col("u").as("component")))
      .distinct()
  }

  /**
   * 60-bit SimHash fingerprint: weighted majority vote of h60
   * token-hash bits (+1 per set bit, -1 per clear bit, sign packs the
   * fingerprint), via the custom [[graft.functions.SimHash60Expr]]
   * expression — one tight loop per row, and DuckDB-oracle-verifiable
   * because h60 is md5-derived. Documents whose fingerprints differ in
   * few bits are near-duplicates; at scale, candidate search is a
   * band-join on fingerprint chunks. (The 64-bit xxhash64 variant
   * remains as [[graft.functions.functions.simhash64]].)
   */
  def simhashFp(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.functions.simhash60(TextOps.tokens(col("text")))
        .as("simhash"))

  /**
   * Survivor selection over near-duplicate components: per component,
   * keep the longest document (`n_chars`), smallest `doc_id` on ties —
   * the canonical "which copy enters the training set" decision after
   * [[nearDupComponents]]. One struct-min/max aggregation (map-side
   * partial) — no per-component window sort; at 100 TB this is a
   * single shuffle keyed by component id.
   */
  def nearDupSurvivors(components: DataFrame, docs: DataFrame): DataFrame =
    components
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("component"))
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("component"), (-col("m.neg_id")).as("survivor_id"),
        col("n_members"))
      .orderBy(col("component"))

  /**
   * Leakage-safe train/validation split: near-duplicate COMPONENTS —
   * not documents — are the unit of assignment, so two near-copies
   * can never land on opposite sides of the split (the classic eval
   * contamination: a validation document whose near-duplicate sits in
   * the training set measures memorization, not generalization).
   * Components come from [[starContractComponents]] (the O(log n)
   * path); documents with no near-dup are their own singleton
   * component; the side is `h60(component) mod 100 < valPct` — a
   * deterministic content-independent hash, so the split is
   * reproducible, ~valPct% by component, and replayable by the SQL
   * oracle.
   *
   * Scale shape: the component pass is the star contraction (keyed
   * shuffles on a shrinking edge set); the assignment itself is one
   * left join of the corpus against the (small — only docs that HAVE
   * near-dups) component table plus a narrow hash map. No new
   * data-sized shuffle beyond the join.
   */
  def leakageSafeSplit(docs: DataFrame, threshold: Double = 0.1,
                       valPct: Int = 10): DataFrame = {
    require(valPct >= 0 && valPct <= 100, s"valPct=$valPct")
    val comp = starContractComponents(nearDuplicatePairs(docs, threshold))
      .select(col("id").as("doc_id"), col("component"))
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("split",
        when(pmod(graft.functions.functions.h60(
            col("component").cast("string")), lit(100L)) < valPct, "val")
          .otherwise("train"))
  }

  /**
   * Fuzzy (edit-distance) near-dup pairs over normalized prefixes —
   * the dedup family's answer to typo/OCR variants that defeat exact
   * and shingle methods: docs whose first `prefixLen` normalized chars
   * are within Levenshtein `maxDist`. Candidates are blocked on the
   * first `blockLen` chars (standard blocking tradeoff: an edit inside
   * the block key escapes the comparison — documented, not hidden) and
   * blocks above `maxBlock` docs are dropped whole (the stop-block
   * guard every self-join op here carries: a degenerate shared prefix
   * would otherwise emit |block|² comparisons). Levenshtein is
   * unit-cost in both engines, so the oracle is exact.
   */
  def fuzzyPairs(docs: DataFrame, prefixLen: Int = 24, blockLen: Int = 8,
                 maxDist: Int = 5, maxBlock: Int = 64): DataFrame = {
    val p = docs.select(col("doc_id"),
        substring(TextOps.normalized(col("text")), 1, prefixLen).as("pfx"))
      .withColumn("blk", substring(col("pfx"), 1, blockLen))
    // stop-block guard as a hot-key anti-join (partial-agg groupBy,
    // broadcast-tiny hot list) — no count-over-window shuffle
    val hotBlk = p.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBlock).select(col("blk"))
    val capped = p.join(hotBlk, Seq("blk"), "left_anti")
    val a = capped.select(col("doc_id").as("doc_a"),
      col("pfx").as("pfx_a"), col("blk"))
    val b = capped.select(col("doc_id").as("doc_b"),
      col("pfx").as("pfx_b"), col("blk"))
    a.join(b, "blk").filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", levenshtein(col("pfx_a"), col("pfx_b")))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}

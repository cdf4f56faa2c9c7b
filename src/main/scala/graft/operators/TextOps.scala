package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines over
 * the `documents` table (`doc_id, text, lang, source, n_chars`).
 *
 * All operators are built from codegen'd `functions._` / higher-order
 * array expressions — no Scala UDFs — so they stay inside whole-stage
 * codegen and scale linearly with a parquet scan: at 100 TB each is a
 * single narrow map stage (no shuffle).
 */
object TextOps {

  // All text entry points coalesce null -> "" so null documents flow
  // through every operator as empty (0 tokens, empty fingerprint)
  // instead of poisoning downstream expressions with SQL nulls.

  /** Explicit non-whitespace class. Java's `\S` and RE2's `\S`
    * disagree on `\x0B` (vertical tab: whitespace to Java, not to
    * RE2); spelling the class out makes both engines tokenize
    * identically, keeping the DuckDB oracle exact. */
  val NonSpace: String = "[^ \\t\\n\\x0B\\f\\r]"

  /** A run of whitespace, same explicit class (Java/RE2-identical). */
  val SpaceRun: String = "[ \\t\\n\\x0B\\f\\r]+"

  /** Tokens = maximal runs of non-whitespace. */
  def tokens(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(NonSpace + "+"), lit(0))

  /** Lower-cased alphabetic word tokens (for language/stopword stats). */
  def wordTokens(text: Column): Column =
    regexp_extract_all(lower(coalesce(text, lit(""))), lit("[a-z]+"), lit(0))

  /** Whitespace-normalized text: lower, collapse runs, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(coalesce(text, lit(""))), SpaceRun, " "))

  /** Deterministic document fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** BPE-ish pre-tokenizer (GPT-2-style pattern, lookahead-free so the
    * same pattern runs on Java regex and RE2): contractions, letter
    * runs, digit runs, punctuation runs, whitespace runs. Whitespace is
    * spelled as an explicit class (see [[NonSpace]]) so Java and RE2
    * agree on `\x0B`. */
  val BpePattern: String =
    "'(?:ll|ve|re|[sdmt])| ?[a-zA-Z]+| ?[0-9]+| ?[^ \\t\\n\\x0B\\f\\ra-zA-Z0-9]+|[ \\t\\n\\x0B\\f\\r]+"

  /** BPE-ish sub-word-ready tokens of the raw text. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(BpePattern), lit(0))

  /**
   * Rolling-hash document fingerprints: a polynomial hash (base 1000003
   * mod 2³¹−1) over every `k`-byte sliding window, mod-sampled
   * (hash % mod == 0, winnowing-style) and deduplicated — a compact
   * sketch for containment/overlap detection. Custom zero-copy
   * expression ([[graft.functions.RollingPolyFpExpr]]): O(1) rolling
   * update per window, no per-window substring allocation, and the same
   * arithmetic is recomputable in DuckDB SQL for the oracle. At 100 TB
   * the fingerprint set (~len/mod values) is what shuffles, never the
   * text. (The raw-throughput XXH64 variant remains as
   * [[graft.functions.functions.rolling_fingerprints]].)
   */
  def rollingFingerprints(text: Column, k: Int = 8, mod: Int = 4): Column =
    graft.functions.functions.rolling_poly_fp(coalesce(text, lit("")), k, mod)

  /**
   * Deterministic hash sampling: keep a row iff
   * h60(id || ':' || salt) mod 100 < pct. The training-pipeline way to
   * cut a reproducible p% corpus slice — no RNG state, stable under
   * re-partitioning and re-runs, composable across engines (the oracle
   * recomputes the identical predicate), and at 100 TB it is a pure
   * narrow filter pushed into the scan.
   */
  def hashSample(df: DataFrame, idCol: String, pct: Int,
                 salt: String = "graft"): DataFrame =
    df.filter(samplePredicate(col(idCol), pct, salt))

  /** The h60 Bernoulli-membership predicate behind [[hashSample]] —
    * shared (not re-derived) by [[Sketches.sampleSumAudit]] so the
    * estimator can never drift from the sampler it audits. */
  def samplePredicate(id: Column, pct: Int, salt: String): Column =
    graft.functions.functions.h60(
      concat(id.cast("string"), lit(":"), lit(salt))) % 100 < pct

  /**
   * Deterministic WEIGHTED sampling: keep a row with probability equal
   * to its weight ∈ [0,1] — keep iff h60(id:salt) mod 10⁶ is below
   * floor(weight·10⁶). Reproducible Bernoulli per row with no RNG
   * state (quality-proportional corpus downsampling); a pure narrow
   * filter at any scale.
   */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     salt: String = "graft"): DataFrame =
    df.filter(graft.functions.functions.h60(
      concat(col(idCol).cast("string"), lit(":"), lit(salt))) % 1000000L <
      floor(weight * 1000000.0).cast("long"))

  /**
   * Stratified quota sampling: the `quota` hash-smallest rows per
   * stratum — a balanced per-group sample whose membership is a pure
   * function of the data. One shuffle on the stratum key; the
   * window-free alternative at scale is [[graft.functions.TopKByScore]]
   * with negated keys.
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       quota: Int, salt: String = "graft"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(graft.functions.functions.h60(
        concat(col(idCol).cast("string"), lit(":"), lit(salt))), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  // Cleaning / PII patterns kept to a regex subset with identical
  // semantics in Java regex and DuckDB's RE2 (no lookaround, no
  // backrefs) so the oracle can replay them.
  val UrlPattern: String = "https?://" + NonSpace + "+"
  val EmailPattern: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern: String = "\\+?[0-9][0-9() .-]{7,}[0-9]"
  val Ipv4Pattern: String =
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** C4-style cleaning: strip URLs and e-mail addresses, drop control
    * characters, collapse whitespace runs, trim. A pure narrow map —
    * the canonical first stage of a pretraining-data pipeline. */
  def cleaned(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      coalesce(text, lit("")),
      UrlPattern, ""), EmailPattern, ""), "[\\x00-\\x1f]", " "), SpaceRun, " "))

  /** PII signal counts per document (URL / e-mail / phone / IPv4
    * matches) — the filter inputs a safety pass needs. */
  def piiFlags(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(coalesce(col("text"), lit("")),
        lit(UrlPattern), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(coalesce(col("text"), lit("")),
        lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(coalesce(col("text"), lit("")),
        lit(PhonePattern), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(coalesce(col("text"), lit("")),
        lit(Ipv4Pattern), lit(0))).cast("long").as("n_ipv4"))

  /**
   * PII redaction — the scrub stage downstream of [[piiFlags]]: the
   * four PII classes are REPLACED with stable type tags rather than
   * counted, whitespace re-collapsed. Replacement order is fixed and
   * load-bearing: URLs first (an email-shaped substring inside a URL
   * belongs to the URL), then emails, then IPv4 BEFORE phone (the
   * loose phone class `[0-9() .-]` would otherwise eat dotted quads).
   * A pure narrow map — four codegen'd regexp passes, zero shuffles;
   * at 100 TB this is scan-bound, exactly as a scrub stage should be.
   */
  def piiScrub(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(coalesce(text, lit("")),
        UrlPattern, "<URL>"), EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"), PhonePattern, "<PHONE>"), SpaceRun, " "))

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Count of tokens that are in `stop` (each occurrence counts).
    * One-pass hash-probe expression — the `size(filter(toks, isin))`
    * composition it replaces ran an interpreted lambda doing
    * |stop| string compares per token. */
  def stopwordCount(toks: Column, stop: Seq[String] = EnglishStopwords): Column =
    graft.functions.functions.count_in_set(toks, stop).cast("int")

  /** Sum of token lengths (exact integer arithmetic, one pass). */
  def totalTokenLen(toks: Column): Column =
    graft.functions.functions.array_total_strlen(toks)

  /**
   * Per-document token statistics: token count, character count,
   * average token length. Integer counts divided as doubles — exact
   * inputs, deterministic output.
   */
  def tokenStats(docs: DataFrame): DataFrame = {
    // stage the extract once (see qualityScore)
    val staged = docs.select(col("doc_id"), col("text"),
      tokens(col("text")).as("__toks"))
    val toks = col("__toks")
    staged.select(
      col("doc_id"),
      length(coalesce(col("text"), lit(""))).cast("long").as("n_chars_text"),
      size(toks).cast("long").as("n_tokens"),
      (totalTokenLen(toks).cast("double") /
        greatest(size(toks).cast("double"), lit(1.0))).as("avg_token_len"))
  }

  /**
   * Heuristic quality score in [0,1]: blend of length sanity, stopword
   * presence and mean token length — the shape of public quality
   * filters (C4/Gopher-style rules) expressed as pure column math.
   */
  def qualityScore(docs: DataFrame): DataFrame = {
    // stage the token array once: every downstream expression
    // referencing an inline wordTokens() would re-run the regex extract
    // per reference (~4× per row); a named non-cheap alias survives
    // CollapseProject, so the extract happens exactly once
    val staged = docs.select(col("doc_id"), col("text"),
      wordTokens(col("text")).as("__toks"))
    val toks = col("__toks")
    val nTok = size(toks).cast("double")
    val nStop = stopwordCount(toks).cast("double")
    val avgLen = totalTokenLen(toks).cast("double") / greatest(nTok, lit(1.0))
    val stopRatio = nStop / greatest(nTok, lit(1.0))
    val lenOk = when(length(coalesce(col("text"), lit("")))
      .between(20, 100000), lit(1.0)).otherwise(lit(0.0))
    val tokOk = when(avgLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    val stopOk = when(stopRatio > 0.01, lit(1.0)).otherwise(lit(0.0))
    staged.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      stopRatio.as("stopword_ratio"),
      avgLen.as("avg_token_len"),
      ((lenOk + tokOk + stopOk) / lit(3.0)).as("quality"))
  }

  /**
   * N-gram-free language-ID heuristic: English stopword density vs. the
   * labeled `lang` column. (A full char-n-gram profile model is layered
   * on the same token machinery; the gate here is the deterministic
   * stopword-density classifier.)
   */
  def langIdHeuristic(docs: DataFrame): DataFrame = {
    // same staging as qualityScore: one regex extract per row
    val staged = docs.select(col("doc_id"), col("lang"),
      wordTokens(col("text")).as("__toks"))
    val toks = col("__toks")
    val nTok = size(toks).cast("double")
    val nStop = stopwordCount(toks).cast("double")
    val ratio = nStop / greatest(nTok, lit(1.0))
    staged.select(
      col("doc_id"),
      col("lang").as("labeled_lang"),
      ratio.as("en_stopword_ratio"),
      when(ratio >= 0.08, lit("en")).otherwise(lit("other")).as("guessed_lang"))
  }

  /**
   * Corpus-composition report: per `source`, document count, char
   * volume, mean/median length, language spread — the mix dashboard a
   * data curator reads before weighting sources. One shuffle on the
   * (low-cardinality) source key; exact median via `percentile`
   * (per-group sort of that group's values only).
   */
  def sourceMix(docs: DataFrame): DataFrame =
    docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        expr("percentile(n_chars, 0.5D)").as("median_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("source"))

  /**
   * Curriculum binning: exact `ntile(n)` over (quality DESC, doc_id)
   * WITHOUT a global sort. The global rank decomposes into
   * (1) a per-quality-value offset (quality takes few distinct values;
   * any low-cardinality score works), (2) a per-(quality, id-range
   * bucket) cumulative offset — range buckets align with the doc_id
   * order, so lower buckets strictly precede higher ones — and
   * (3) `row_number` inside each (quality, bucket) partition. The
   * offset dimension has corpus/rankBucket rows (aggregate it with the
   * two-level window trick of `CdcOps.gapDetection` if even that is
   * huge); the per-row work shuffles on (quality, bucket), which is as
   * fine-grained as you choose. Bit-identical to SQL `ntile` given the
   * same order, but no stage ever sees more than one bucket in one
   * sort, so it survives 100 TB where `Window.orderBy` (single
   * partition) — or even a per-quality window over a 4-value key —
   * cannot.
   */
  def qualityDeciles(docs: DataFrame, n: Int = 10,
                     rankBucket: Long = 1000000L): DataFrame = {
    // (doc_id, quality, bkt) — three longs per doc, read by the count
    // aggregate AND the final rank join: checkpoint so the
    // regexp-heavy qualityScore runs once, not twice
    val q = qualityScore(docs).select(col("doc_id"), col("quality"))
      .withColumn("bkt", col("doc_id") - pmod(col("doc_id"), lit(rankBucket)))
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
    // per-(quality, bucket) counts -> cumulative start of each bucket
    // within its quality, plus each quality's global offset and the
    // grand total (the offset dimension is small; windows here run
    // over bucket counts, never over rows)
    val counts = q.groupBy(col("quality"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val wInQ = w.partitionBy(col("quality")).orderBy(col("bkt"))
    val wAllQ = w.orderBy(col("quality").desc)
      .rowsBetween(w.unboundedPreceding, -1)
    val qTotals = counts.groupBy(col("quality")).agg(sum(col("cnt")).as("qcnt"))
      .withColumn("qoffset", coalesce(sum(col("qcnt")).over(wAllQ), lit(0L)))
      .withColumn("total", sum(col("qcnt")).over(
        w.orderBy(col("quality"))
          .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)))
      .select(col("quality"), col("qoffset"), col("total"))
    val offsets = counts
      .withColumn("boffset", coalesce(sum(col("cnt")).over(
        wInQ.rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
      .join(qTotals, "quality")
      .select(col("quality"), col("bkt"),
        (col("qoffset") + col("boffset")).as("offset"), col("total"))
    val wqb = w.partitionBy(col("quality"), col("bkt")).orderBy(col("doc_id"))
    // ntile(n): the first (total mod n) deciles hold ceil(total/n)
    // rows; DIV keeps the rank arithmetic integral end to end
    q.join(broadcast(offsets), Seq("quality", "bkt"))
      .withColumn("r", col("offset") + row_number().over(wqb).cast("long") - 1)
      .select(col("doc_id"),
        expr(s"""CAST(CASE WHEN r < (total % $n) * (total DIV $n + 1)
                 THEN r DIV (total DIV $n + 1) + 1
                 ELSE (total % $n) + (r - (total % $n) * (total DIV $n + 1))
                      DIV (total DIV $n) + 1 END AS INT)""").as("decile"))
      .orderBy(col("doc_id"))
  }

  /**
   * Benchmark-contamination check: training documents that share at
   * least one word `k`-gram with a held-out (benchmark) subset.
   * Returns `(doc_id, n_shared)` for contaminated docs only — the
   * decontamination filter of a pretraining pipeline. The held-out
   * side is the distinct gram set of a benchmark-sized corpus (tiny
   * relative to training data), so at 100 TB the join is a broadcast
   * of the benchmark grams against the exploded training grams — AQE
   * picks that up from the runtime size; no hint needed.
   */
  def contamination(docs: DataFrame, heldoutMod: Long = 50,
                    k: Int = 8): DataFrame = {
    val sh = Dedup.shingleSets(docs, k)
    val train = sh.filter(pmod(col("doc_id"), lit(heldoutMod)) =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("gram"))
    val held = sh.filter(pmod(col("doc_id"), lit(heldoutMod)) === 0)
      .select(explode(col("sh")).as("gram")).distinct()
    train.join(held, "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** Alphanumeric normalization for fuzzy matching: lower-case, every
    * run of non-alphanumerics (punctuation AND whitespace) collapses
    * to one space — so "Fox, jumps!" ≡ "fox jumps". Engine-identical
    * (explicit class, 'g'-flagged on the DuckDB side). */
  def normalizedAlnum(text: Column): Column =
    trim(regexp_replace(lower(coalesce(text, lit(""))),
      "[^a-z0-9]+", " "))

  /**
   * Edit-tolerant decontamination — [[contamination]]'s answer to
   * benchmark leakage that survives whitespace/punctuation drift and
   * small edits (the way real eval lines leak into crawls). Composes
   * the normalized-shingle machinery with the [[Dedup.fuzzyPairs]]
   * screen discipline: candidate (train, held) pairs come from shared
   * `k`-token shingles over [[normalizedAlnum]] text (df-capped at
   * `maxDf` train docs — boilerplate shingles generate candidate
   * floods, not evidence), and a pair is flagged when EITHER the
   * shingle evidence survives an edit budget with a majority floor
   * (`n_shared ≥ max(n_held − k·editBudget, ⌈n_held/2⌉)` — a single
   * token edit kills at most `k` shingles, so a near-verbatim
   * inclusion keeps most of them wherever it sits in the train doc;
   * the majority floor keeps the branch from going vacuous on short
   * held lines, where the budget alone would flag any 1-shingle
   * match) OR the held line's normalized prefix is within Levenshtein
   * `maxDist` of the train doc's LENGTH-MATCHED prefix (the
   * fuzzy-block verify for short lines — truncated to the held
   * prefix's length so embedding in a longer doc isn't charged as
   * edits).
   * Output: `train_id, held_id, n_shared, n_held, lev_pfx` — all
   * integers, engine-exact (Levenshtein is unit-cost on both).
   *
   * Scale shape: one shingle-keyed join (df-capped, never skewed), a
   * pair-keyed rollup, and a per-pair O(prefixLen²) verify on the
   * candidate set only — the fuzzyPairs cost shape; no all-pairs path.
   */
  def contaminationFuzzy(docs: DataFrame, heldoutMod: Long = 50,
                         k: Int = 4, maxDf: Int = 64, prefixLen: Int = 64,
                         maxDist: Int = 8, editBudget: Int = 2): DataFrame = {
    val normp = normalizedAlnum(col("text"))
    val base = docs.select(col("doc_id"),
      graft.functions.functions.word_shingles(normp, k).as("sh"),
      substring(normp, 1, prefixLen).as("pfx"))
    val held = base.filter(pmod(col("doc_id"), lit(heldoutMod)) === 0)
      .select(col("doc_id").as("held_id"),
        size_(col("sh")).cast("long").as("n_held"),
        col("pfx").as("pfx_h"), explode(col("sh")).as("gram"))
    val train = base.filter(pmod(col("doc_id"), lit(heldoutMod)) =!= 0)
      .select(col("doc_id").as("train_id"), col("pfx").as("pfx_t"),
        explode(col("sh")).as("gram"))
    // hot-shingle anti-join, partial-agg + broadcast-tiny hot list
    // (the fuzzyPairs stop-block guard, keyed on the gram)
    val hot = train.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("gram"))
    val capped = train.join(hot, Seq("gram"), "left_anti")
    capped.join(held, "gram")
      .groupBy(col("train_id"), col("held_id"))
      // prefixes are constant per id: max() carries them through the
      // one pair-keyed shuffle instead of two extra joins
      .agg(count(lit(1)).as("n_shared"), max(col("n_held")).as("n_held"),
        max(col("pfx_t")).as("pfx_t"), max(col("pfx_h")).as("pfx_h"))
      // the train prefix is TRUNCATED to the held prefix's length:
      // the held line is usually EMBEDDED in a longer train doc, and
      // an untruncated compare would charge the length difference as
      // edits (review r8)
      .withColumn("lev_pfx",
        levenshtein(col("pfx_t").substr(lit(1), length(col("pfx_h"))),
          col("pfx_h")).cast("long"))
      // shingle branch: the edit budget AND a majority floor — for a
      // short held line (n_held ≤ k·editBudget) the budget alone is
      // vacuous and a single shared 4-gram would flag any train doc
      // (review r8); requiring ⌈n_held/2⌉ keeps the branch meaningful
      // at every length, and genuinely short lines are the prefix
      // screen's job
      .filter((col("n_shared") >= col("n_held") - lit(k.toLong * editBudget)
          && col("n_shared") * 2 >= col("n_held"))
        || col("lev_pfx") <= maxDist)
      .select(col("train_id"), col("held_id"), col("n_shared"),
        col("n_held"), col("lev_pfx"))
      .orderBy(col("train_id"), col("held_id"))
  }

  /**
   * N-gram novelty: per document, how many of its distinct word
   * `k`-grams appear here FIRST (no earlier doc_id contains them) —
   * the "how much new content does this doc add" curve that drives
   * crawl-dedup priority and corpus-growth analysis. One shuffle keyed
   * by gram for the global first-occurrence aggregate, one keyed by
   * doc for the rollup; gram keys are text but could hash to h60 at
   * scale (kept as text so the oracle compares exact strings).
   */
  def ngramNovelty(docs: DataFrame, k: Int = 8): DataFrame = {
    val g = Dedup.shingleSets(docs, k)
      .select(col("doc_id"), explode(col("sh")).as("gram"))
    val first = g.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    g.join(first, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .orderBy(col("doc_id"))
  }

  /**
   * Kneser–Ney bigram LM count table — the integer ingredients of a
   * KN-smoothed bigram language model, the statistic behind
   * perplexity-based quality filtering when no neural LM is at hand:
   * for each bigram (w1, w2), its corpus token count `c`, the left
   * unigram count `c_w1` (the KN denominator), the fan-out
   * `n1p_w1x` = |{w' : c(w1, w') > 0}| (the backoff weight's
   * numerator) and the continuation count `n1p_xw2` =
   * |{w' : c(w', w2) > 0}| (KN's "how many contexts has w2 completed"
   * — the term that demotes "Francisco"-style words that are frequent
   * but context-bound). P_kn is then assembled from these four
   * integers and a discount; emitting the exact integer ingredients
   * rather than the float probability keeps the oracle comparison
   * engine-exact.
   *
   * Scale shape: the token stream shuffles ONCE on the bigram key
   * with map-side partial counting; every other statistic (`c_w1`,
   * both type counts) derives from the aggregated TYPE table — orders
   * of magnitude smaller than the token stream — via two further tiny
   * keyed aggs that AQE handles. No windows, no self-joins.
   */
  def knBigramCounts(docs: DataFrame): DataFrame = {
    // tokenization materialized once per row, below the slices
    val toks = col("toks")
    val bigrams = docs
      .select(wordTokens(col("text")).as("toks"))
      .select(zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))).as("bg"))
      .select(explode(col("bg")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val left = bigrams.groupBy(col("w1"))
      .agg(sum(col("c")).as("c_w1"), count(lit(1)).as("n1p_w1x"))
    val cont = bigrams.groupBy(col("w2"))
      .agg(count(lit(1)).as("n1p_xw2"))
    bigrams.join(left, "w1").join(cont, "w2")
      .select(col("w1"), col("w2"), col("c"), col("c_w1"),
        col("n1p_w1x"), col("n1p_xw2"))
  }

  /**
   * Rare-bigram fraction inputs: per document, its distinct word
   * bigrams and how many have corpus document-frequency below
   * `minDf` — the "made-up word sequences" signal (high rare share =
   * OCR noise, boilerplate mangling, or generated gibberish). Integer
   * outputs, so the oracle comparison is exact. Same two-shuffle shape
   * as [[ngramNovelty]] (gram key, then doc key).
   */
  def rareBigrams(docs: DataFrame, minDf: Int = 3): DataFrame = {
    val g = Dedup.shingleSets(docs, 2)
      .select(col("doc_id"), explode(col("sh")).as("gram"))
    // shingle sets are distinct per doc, so count(*) = doc frequency
    val freq = g.groupBy(col("gram")).agg(count(lit(1)).as("dfreq"))
    g.join(freq, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("dfreq") < minDf, 1L).otherwise(0L)).as("n_rare"))
      .orderBy(col("doc_id"))
  }

  /**
   * Cross-source overlap matrix: for every source pair, how many
   * distinct word 3-grams they share — the dashboard a curator reads
   * to spot mirrored/syndicated content between crawls before
   * weighting them independently. Each source's distinct-gram set is
   * built with one aggregation; the pair counts come from a gram-keyed
   * self-join (work ∝ true cross-source collisions, never
   * |A|·|B|).
   *
   * `maxSourceDf` is the stop-gram guard the self-join needs at scale
   * (the same hazard [[Dedup.containmentPairs]] caps): a gram present
   * in s sources emits s² join rows, so ubiquitous grams at
   * thousands-of-sources corpora would dominate the output with
   * discrimination-free mass. Grams above the cap are dropped BEFORE
   * the join; the default is far above the test corpus's 20 sources
   * (inactive there — the oracle counts every shared gram) but bounds
   * the worst gram at production source counts.
   */
  def sourceOverlap(docs: DataFrame, maxSourceDf: Int = 64): DataFrame = {
    val g = Dedup.shingleSets(docs, 3)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), explode(col("sh")).as("gram"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    val capped = g.select(col("source"), col("gram"),
        count(lit(1)).over(w).as("sdf"))
      .filter(col("sdf") <= maxSourceDf)
    capped.select(col("source").as("source_a"), col("gram"))
      .join(capped.select(col("source").as("source_b"), col("gram")), "gram")
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /**
   * Most-distinctive terms per document, ranked by tf/df — the
   * TF-IDF-style keyword signal without a corpus-size log (the ratio
   * ranks identically to tf·idf for a fixed doc and needs no
   * floating-point log, so both engines order bit-identically: IEEE
   * division is correctly rounded, ties break on the term itself).
   * Shape at scale: one explode→(doc,term) aggregate, a term-keyed df
   * aggregate of the *already-aggregated* tf frame (≪ token count),
   * one join keyed by term, one per-doc window — every shuffle keyed
   * and balanced.
   */
  def topTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(wordTokens(col("text"))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy((col("tf").cast("double") / col("dfreq")).desc, col("term"))
    tf.join(df, "term")
      .select(col("doc_id"), col("term"), col("tf"), col("dfreq"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= k)
      .orderBy(col("doc_id"), col("rnk"))
  }

  /**
   * Lexical-diversity profile per document: char- and token-level
   * Gini–Simpson indexes (1 − Σpᵢ²) plus type counts. Simpson replaces
   * Shannon entropy deliberately: it is a pure rational function of
   * integer counts — `(n² − Σcᵢ²)/n²` — so the oracle matches exactly,
   * where a log-based entropy's last-ulp `ln` differences across
   * engines would make floor-quantized values flap. (The surviving
   * divisions are single correctly-rounded IEEE ops.) One narrow
   * explode + two keyed aggregates per level; no corpus-wide state.
   */
  def diversity(docs: DataFrame): DataFrame = {
    def simpson(counts: DataFrame, unit: String): DataFrame =
      counts.groupBy(col("doc_id"))
        .agg(sum(col("c")).as(s"n_$unit"),
          count(lit(1)).as(s"n_${unit}_distinct"),
          sum(col("c") * col("c")).as("ss"))
        .select(col("doc_id"), col(s"n_$unit"), col(s"n_${unit}_distinct"),
          (lit(1.0) - col("ss").cast("double") /
            (col(s"n_$unit") * col(s"n_$unit"))).as(s"${unit}_simpson"))
    val chars = docs.select(col("doc_id"),
        explode(regexp_extract_all(normalized(col("text")), lit("."), lit(0)))
          .as("u"))
      .groupBy(col("doc_id"), col("u")).agg(count(lit(1)).as("c"))
    val toks = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("u"))
      .groupBy(col("doc_id"), col("u")).agg(count(lit(1)).as("c"))
    // empty/whitespace-only docs produce no char or token rows: inner
    // join keeps the operator total only over non-empty documents,
    // which is the population a diversity gate filters anyway
    simpson(chars, "chars").join(simpson(toks, "tokens"), "doc_id")
      .orderBy(col("doc_id"))
  }

  /**
   * Temperature-resampling plan per source (UniMax/multilingual-mixing
   * style, T=2): weight each source by √tokens, then split a token
   * budget proportionally. All arithmetic is exact cross-engine: IEEE
   * `sqrt` is correctly rounded, weights are floor-quantized to a 2⁻²⁰
   * lattice BEFORE summing (integer total — float summation order
   * never matters), and shares/targets are integer division. The
   * per-source stats are one aggregate; the tiny source dimension then
   * combines with a windowless cross-join of one total row. The
   * share/target products are formed in DECIMAL(38,0) — `w_q20` grows
   * as √tokens·2²⁰, so a Long product would wrap past ~7.7·10¹¹
   * tokens in one source (well inside the 100 TB design point); the
   * quotients themselves are ≤ max(10⁶, tokenBudget) and return as
   * BIGINT.
   */
  def sourceTemperature(docs: DataFrame,
                        tokenBudget: Long = 10000000L): DataFrame = {
    val per = docs.select(col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        floor(sqrt(col("n_tokens").cast("double")) * 1048576.0)
          .cast("long").as("w_q20"))
    val total = per.agg(sum(col("w_q20")).as("w_total"))
    per.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("w_q20"),
        expr("(cast(w_q20 as decimal(38,0)) * 1000000) div w_total")
          .as("share_ppm"),
        expr(s"(cast(w_q20 as decimal(38,0)) * ${tokenBudget}L) div w_total")
          .as("target_tokens"))
      .orderBy(col("source"))
  }

  /**
   * Per-source document cap — the C4/RefinedWeb "domain cap" step: a
   * crawl where one domain contributes millions of pages would
   * dominate the mix, so each source keeps only its `perSource` best
   * documents by (quality gates, length, doc_id) — the quality key is
   * the [[qualityScore]] gate count (0..3, integer-exact) scaled past
   * the length so quality strictly dominates, length breaks quality
   * ties, doc_id makes it total.
   *
   * Scale shape: ranking runs through the bounded
   * [[graft.functions.TopKByScore]] aggregate — map-side partial
   * aggregation ships ≤ `perSource` candidates per partition per
   * source across the shuffle, where the row_number()-window
   * formulation would shuffle and sort EVERY document by source (and
   * a hot source would be one giant sort partition — precisely the
   * skew a domain cap exists to manage).
   */
  def domainCap(docs: DataFrame, perSource: Int = 100): DataFrame = {
    require(perSource > 0, s"perSource=$perSource")
    val staged = docs.select(col("doc_id"), col("source"), col("n_chars"),
      col("text"), wordTokens(col("text")).as("__toks"))
    val toks = col("__toks")
    val nTok = size(toks).cast("double")
    val avgLen = totalTokenLen(toks).cast("double") / greatest(nTok, lit(1.0))
    val stopRatio = stopwordCount(toks).cast("double") / greatest(nTok, lit(1.0))
    // the three qualityScore gates as an integer count (no /3.0 — the
    // divide-then-multiply round trip is not double-exact for 2/3)
    val gates =
      when(length(coalesce(col("text"), lit(""))).between(20, 100000),
        lit(1.0)).otherwise(lit(0.0)) +
        when(avgLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0)) +
        when(stopRatio > 0.01, lit(1.0)).otherwise(lit(0.0))
    // gates ≤ 3, n_chars < 10⁶ by the length gate: both exact in double
    val key = gates * lit(1000000.0) + col("n_chars").cast("double")
    staged.groupBy(col("source"))
      .agg(graft.functions.TopKByScore.top_k(
        key, col("doc_id"), key, perSource).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), col("col.sim").cast("long").as("cap_score"))
  }

  /**
   * Overlapping token-window chunking — the complement of
   * [[packChunks]]: instead of packing short documents up to a budget,
   * split long ones into fixed-size windows advancing by `stride`
   * (stride < size ⇒ overlap, the RAG/training-context shape). Chunk
   * text is emitted as md5 so the output stays bounded. The token
   * array is staged once per row (named alias survives
   * CollapseProject) and the per-chunk `slice` runs AFTER the explode,
   * outside any lambda — referencing the tokens inside a `transform`
   * would re-run the regex extraction per chunk. Pure narrow map at
   * any scale.
   */
  def chunkSplit(docs: DataFrame, size: Int = 32,
                 stride: Int = 16): DataFrame = {
    require(stride > 0 && size > 0, s"size=$size stride=$stride")
    val staged = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size_(col("toks")).as("n"))
      .filter(col("n") > 0)
    // chunk starts: 0, stride, 2·stride … < n (last window may be short)
    staged
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0),
          expr(s"int((n - 1) div $stride)"))).as("ci"))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_id"),
        slice(col("toks"), col("ci") * lit(stride) + lit(1),
          lit(size)).as("ctoks"))
      .select(col("doc_id"), col("chunk_id"),
        size_(col("ctoks")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("ctoks"))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /**
   * Unigram-surprisal quality signal: mean per-token surprisal of each
   * document under the corpus's OWN unigram distribution, in integer
   * "floor bits" — surprisal(t) = floor(log₂(N / c_t)) computed as
   * `length(bin(N div c_t)) − 1` (binary-string integer log₂, the same
   * trick as the HLL ρ and the log histogram: no floating `log` ever
   * runs, so both engines agree bit-for-bit). Rare-token-heavy
   * documents (OCR noise, gibberish, wrong-language residue) score
   * high; boilerplate scores low — the cheap LM-free stand-in for
   * perplexity filtering. Output: `doc_id, n_tokens, sum_bits,
   * mean_bits_ppm` (integer ppm).
   *
   * Scale shape: per-(doc, token) counts first (one keyed aggregate —
   * the occurrence stream never joins), corpus counts keyed by token,
   * join back on the token key at (doc × distinct-token) granularity;
   * stopword-grade hot tokens are AQE-skew-join territory, same as
   * the novelty/rare-bigram family. One tiny broadcast total.
   */
  /**
   * Tokenizer fertility report per language — the tokenizer-fit
   * diagnostic a pretraining-mix owner reads before locking a vocab:
   * per language, total UTF-8 bytes, whitespace words, and BPE-ish
   * sub-word tokens, plus the two ratios in exact ppm
   * (bytes-per-token and tokens-per-word — "fertility"). A language
   * whose fertility is far above the corpus mean is being shredded
   * by the tokenizer (cost multiplier at training time). One pass,
   * one tiny language-keyed aggregate; ratios on the integer ppm
   * lattice so the oracle matches exactly.
   */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        length(encode(coalesce(col("text"), lit("")), "UTF-8"))
          .cast("long").as("b"),
        size(tokens(col("text"))).cast("long").as("w"),
        size(bpeishTokens(col("text"))).cast("long").as("t"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("b")).as("n_bytes"),
        sum(col("w")).as("n_words"), sum(col("t")).as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_bytes"), col("n_words"),
        col("n_tokens"),
        expr("(n_bytes * 1000000) div n_tokens").as("bytes_per_tok_ppm"),
        expr("(n_tokens * 1000000) div n_words").as("tok_per_word_ppm"))

  /** Symbol-boundary sentinels for the BPE vocab strings: every symbol
    * in a segmentation is WRAPPED as `\u0001sym\u0002` (SOH…STX), so a
    * pair (a, b) occurs exactly as the substring
    * `\u0001a\u0002\u0001b\u0002` and a plain left-to-right
    * non-overlapping string `replace` of that substring with
    * `\u0001ab\u0002` IS the greedy BPE merge application — on both
    * engines, with identical semantics ("aaaa" under merge (a,a)
    * becomes (aa)(aa), because the second scan resumes after the first
    * match's replacement). The TERMINATOR is what makes the match
    * symbol-exact: with prefix-only sentinels, pair (v,e) would falsely
    * match inside [v, er] (the next symbol merely STARTS with "e") and
    * corrupt it to the single symbol "ver" — the Sennrich divergence
    * the r8 advisor caught (a merge must apply only where the pair
    * occurs as WHOLE adjacent symbols). Input words containing either
    * sentinel are excluded from the vocab. */
  private val Sent = "\u0001"
  private val Term = "\u0002"

  private def bpeSyms(s: Column): Column =
    regexp_extract_all(s,
      lit(Sent + "([^" + Sent + Term + "]+)" + Term), lit(1))

  /** The corpus word-frequency vocab with sentinelized char-level
    * segmentations — the ONE corpus scan all BPE rounds fold over. */
  private def bpeVocab(docs: DataFrame): DataFrame =
    docs.select(explode(bpeishTokens(col("text"))).as("word"))
      .filter(!col("word").rlike("^" + SpaceRun + "$") &&
        !col("word").contains(Sent) && !col("word").contains(Term))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      // (?s): Java's '.' excludes U+0085/U+2028/U+2029 (its line
      // terminators) while RE2's excludes only \n — a word containing
      // one would sentinelize differently per engine (the \x0B class
      // of bug, review r8); DOTALL makes both match every char
      .select(col("word"), col("freq"),
        regexp_replace(col("word"), "(?s)(.)", Sent + "$1" + Term).as("s"))

  /** Adjacent-symbol pair counts of a vocab frame, freq-weighted
    * (every adjacent position counts, the standard BPE statistic). */
  private def bpePairs(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"), bpeSyms(col("s")).as("l"))
      .select(col("freq"), explode(zip_with(
        slice(col("l"), lit(1), greatest(size_(col("l")) - 1, lit(0))),
        slice(col("l"), lit(2), greatest(size_(col("l")) - 1, lit(0))),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Shared BPE training loop: returns (merge table, final vocab).
    * See [[bpeLearn]] for semantics and the scale story. */
  private[operators] def bpeState(docs: DataFrame,
                                  merges: Int): (DataFrame, DataFrame) = {
    require(merges >= 1 && merges <= 64, s"merges=$merges")
    var vocab = bpeVocab(docs).localCheckpoint(true)
    val rounds = Seq.newBuilder[DataFrame]
    for (r <- 1 to merges) {
      // deterministic top-1: count desc, then lexicographically
      // smallest (a, b) — binary string order, identical on both
      // engines for UTF-8. TakeOrderedAndProject, never a global sort.
      val top = bpePairs(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .localCheckpoint(true)
      rounds += top.select(lit(r.toLong).as("merge_round"),
        col("a").as("left_sym"), col("b").as("right_sym"),
        concat(col("a"), col("b")).as("merged"),
        col("cnt").as("pair_count"))
      // LEFT join, not crossJoin: a corpus that exhausts its pairs
      // before `merges` rounds has an EMPTY top-1 frame, and a cross
      // join would annihilate the whole vocab (review r8) — the
      // remaining rounds must be identity, matching the oracle's
      // exhausted-round CASE
      vocab = vocab.join(broadcast(top), lit(true), "left")
        .select(col("word"), col("freq"),
          when(col("a").isNull, col("s"))
            .otherwise(replace(col("s"),
              concat(lit(Sent), col("a"), lit(Term),
                lit(Sent), col("b"), lit(Term)),
              concat(lit(Sent), col("a"), col("b"), lit(Term)))).as("s"))
        .localCheckpoint(true)
    }
    (rounds.result().reduce(_ union _).orderBy(col("merge_round")), vocab)
  }

  /**
   * BPE merge learning — the tokenizer-TRAINING stage of the
   * pretraining pipeline (Sennrich et al., 2016): `merges` rounds of
   * "count adjacent symbol pairs over the corpus vocab, merge the
   * most frequent pair everywhere", emitting the learned merge table
   * `merge_round, left_sym, right_sym, merged, pair_count`. Fully
   * deterministic (ties break to the lexicographically smallest
   * pair), so the whole table is hash-gateable against a chained-CTE
   * oracle that replays every round. Greedy merge application is a
   * plain string `replace` over sentinelized segmentations (see
   * [[Sent]]) — byte-identical semantics on both engines, no per-row
   * loops.
   *
   * Scale shape: the ONE corpus scan is the initial word-frequency
   * aggregate; every round after that runs on the VOCAB table
   * (distinct pre-tokens — Zipf-bounded, orders of magnitude smaller
   * than the corpus, ~10⁷ rows even at 100 TB). Per round: one
   * vocab-keyed pair aggregate (map-side combinable), a top-1 via
   * TakeOrderedAndProject (no global sort), and one broadcast 1-row
   * join applying the merge. Rounds chain through LAZY
   * `localCheckpoint`s (each materializes once at first action, plan
   * construction stays side-effect-free — the kmeansAssign
   * discipline); all `merges`+1 persisted frames are vocab-sized, so
   * storage is bounded and small by construction. A corpus that
   * exhausts its pairs before `merges` rounds is at fixpoint: the
   * remaining rounds emit no merge rows and leave the vocab unchanged
   * (spec-pinned; the merge application is a LEFT join against the
   * possibly-empty top-1 frame, identical to the oracle's
   * exhausted-round CASE).
   */
  def bpeLearn(docs: DataFrame, merges: Int = 8): DataFrame =
    bpeState(docs, merges)._1

  /**
   * Corpus fertility under the LEARNED merges — [[tokenizerFertility]]
   * re-scored with [[bpeLearn]]'s output applied: after `merges`
   * rounds, the corpus-level vocab size, word/char/symbol totals and
   * the integer-ppm compression ratios (symbols per word, symbols per
   * char — the numbers that say what the learned tokenizer actually
   * bought). Envelope: `n_symbols·10⁶` must stay under 2⁶³ —
   * ~9·10¹² symbols, a ~40 TB text corpus; past that the ppm pair
   * goes through the decimal lattice (same direction as
   * unigramSurprisal's documented edge).
   */
  def bpeFertility(docs: DataFrame, merges: Int = 8): DataFrame =
    bpeState(docs, merges)._2
      .select(col("freq"), length(col("word")).cast("long").as("ch"),
        size_(bpeSyms(col("s"))).cast("long").as("sy"))
      .agg(count(lit(1)).as("n_vocab"), sum(col("freq")).as("n_words"),
        sum(col("freq") * col("ch")).as("n_chars"),
        sum(col("freq") * col("sy")).as("n_symbols"))
      .select(col("n_vocab"), col("n_words"), col("n_chars"),
        col("n_symbols"),
        expr("(n_symbols * 1000000) div n_words").as("syms_per_word_ppm"),
        expr("(n_symbols * 1000000) div n_chars").as("syms_per_char_ppm"))

  /**
   * Per-document token counts under the LEARNED merges — the
   * inference half of [[bpeLearn]] and the number a training-layout
   * planner actually budgets with (whitespace counts over-estimate;
   * the learned segmentation is what the model sees). Re-derives the
   * trained vocab, then one corpus pass: explode doc words, join the
   * vocab's final segmentation length, roll up per doc. Output:
   * `doc_id, n_words, n_tokens` — integers, engine-exact against the
   * same chained-CTE oracle as the trainer.
   *
   * Scale shape: the vocab-side join input is the Zipf-bounded vocab
   * (AQE broadcast at any realistic size); the corpus side is one
   * narrow explode + a doc-keyed rollup. Docs whose every token is
   * whitespace-run/sentinel-bearing produce no rows (nothing to
   * count).
   */
  def bpeEncode(docs: DataFrame, merges: Int = 8): DataFrame = {
    val vocab = bpeState(docs, merges)._2
      .select(col("word"),
        size_(bpeSyms(col("s"))).cast("long").as("n_syms"))
    docs.select(col("doc_id"), explode(bpeishTokens(col("text"))).as("word"))
      .filter(!col("word").rlike("^" + SpaceRun + "$") &&
        !col("word").contains(Sent) && !col("word").contains(Term))
      .join(vocab, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** A TRAINED BPE tokenizer, ready to serve: the learned merge list
    * in application order. Training collects the merge table once —
    * that collect is bounded TOKENIZER METADATA (≤ 64 pairs, the same
    * driver-side shape as a partition list), NOT corpus data — so the
    * model ships into every serving plan as literals: encoding an
    * arriving micro-batch is a pure codegen'd projection with no join
    * against training state at all. The `foreachBatch` ingest twin of
    * [[NbModel]] (r8 verdict item 7). */
  final case class BpeModel(merges: Seq[(String, String)])

  /** Train once, serve forever: run [[bpeLearn]]'s loop and collect
    * the merge list (eager — the one training pass happens HERE, never
    * inside a serving batch). Capped at [[MaxCodegenMerges]] rounds by
    * the distributed per-round loop (each round is a Spark job — the
    * oracle-replayable path); real vocabularies train through
    * [[bpeTrainTopK]]. */
  def bpeTrain(docs: DataFrame, rounds: Int = 8): BpeModel =
    BpeModel(bpeState(docs, rounds)._1
      .select(col("left_sym"), col("right_sym"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1))))

  /** Persist a trained tokenizer as an ordered merge table — one tiny
    * parquet file (train once, serve from ANY later session/cluster;
    * a real pipeline ships the tokenizer with the dataset card). */
  def bpeSave(spark: org.apache.spark.sql.SparkSession, model: BpeModel,
              path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), i) => (i.toLong + 1L, a, b) }
      .toDF("merge_round", "left_sym", "right_sym")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }

  /** Load a tokenizer persisted by [[bpeSave]] — merge order restored
    * from `merge_round` (application order IS the model). */
  def bpeLoad(spark: org.apache.spark.sql.SparkSession,
              path: String): BpeModel =
    BpeModel(spark.read.parquet(path)
      .orderBy(col("merge_round"))
      .select(col("left_sym"), col("right_sym"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1))))

  /** Unsigned UTF-8 byte order — Spark's (and DuckDB's) binary string
    * ordering, so driver-side tie-breaks match the engine's exactly
    * (UTF-16 `compareTo` diverges for supplementary-plane text). */
  private def utf8Lt(x: String, y: String): Boolean = utf8Cmp(x, y) < 0

  private def utf8Cmp(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /**
   * Real-vocabulary BPE trainer — how 32k-merge tokenizers actually
   * train at 100 TB: the ONE corpus-scan is the distributed
   * word-frequency aggregate; the merge loop then runs driver-side
   * over the collected top-`vocabTopK` vocab (bounded TOKENIZER
   * TRAINING STATE, the same driver-side shape as [[bpeTrain]]'s
   * merge-table collect — a 2²⁰-word vocab is tens of MB, and
   * frequency truncation is the standard `min_frequency` practice:
   * LOUD here as an explicit cap, not a silent heuristic). The
   * in-memory loop replays [[bpeState]]'s semantics exactly — freq-
   * weighted adjacent-pair counts, top pair by count with ties to the
   * UTF-8-smallest (a, b), left-to-right non-overlapping merge
   * application — via an inverted pair→words index, so each round
   * touches only the words containing the chosen pair (Sennrich's
   * algorithm). Differential spec: identical merge tables to the
   * distributed loop at equal rounds whenever `vocabTopK` covers the
   * vocab.
   *
   * Rounds are unbounded (this is the ≥1k-merge path); serving a model
   * trained here goes through [[bpeEncodeWithLocal]] automatically via
   * [[bpeEncodeWith]]'s dispatch.
   */
  def bpeTrainTopK(docs: DataFrame, rounds: Int,
                   vocabTopK: Int = 1 << 20): BpeModel = {
    require(rounds >= 1, s"rounds=$rounds")
    require(vocabTopK >= 1, s"vocabTopK=$vocabTopK")
    // bounded top-K by frequency (word asc on ties — deterministic):
    // TakeOrderedAndProject, never a global sort
    val vocab = bpeVocab(docs)
      .orderBy(col("freq").desc, col("word"))
      .limit(vocabTopK)
      .select(col("word"), col("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // the cap is only LOUD if hitting it is observable (r10 advisory):
    // a collected vocab AT the limit means the corpus vocab was (very
    // likely) truncated and the trained merges can diverge from the
    // full-vocab trainer — warn, don't fail (min_frequency truncation
    // is standard practice; silence is the defect)
    if (vocab.length == vocabTopK)
      System.err.println(s"[graft] bpeTrainTopK: collected vocab hit " +
        s"vocabTopK=$vocabTopK — frequency truncation is binding and " +
        "merges may diverge from the untruncated trainer")
    BpeModel(bpeMergesInMemoryIndexed(vocab, rounds))
  }

  /** The driver-side Sennrich loop over a collected (word, freq)
    * vocab. Package-private for the differential spec. */
  private[operators] def bpeMergesInMemory(
      vocab: Array[(String, Long)], rounds: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    // per-word symbol lists (code points, = the (?s)(.) segmentation)
    val words = vocab.map { case (w, _) =>
      val syms = new mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + n)
        i += n
      }
      syms
    }
    val freqs = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def wordPairs(wi: Int): Iterator[(String, String)] = {
      val s = words(wi)
      (0 until s.length - 1).iterator.map(j => (s(j), s(j + 1)))
    }
    def addWord(wi: Int): Unit = wordPairs(wi).foreach { p =>
      counts(p) = counts.getOrElse(p, 0L) + freqs(wi)
      where.getOrElseUpdate(p, mutable.Set.empty) += wi
    }
    def delWord(wi: Int): Unit = {
      val seen = mutable.Set.empty[(String, String)]
      wordPairs(wi).foreach { p =>
        val c = counts.getOrElse(p, 0L) - freqs(wi)
        if (c == 0L) counts.remove(p) else counts(p) = c
        seen += p
      }
      // a pair may keep count from other words while vanishing from
      // this one: drop membership for exactly this word's pairs
      seen.foreach(p => where.get(p).foreach(_ -= wi))
    }
    words.indices.foreach(addWord)
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      if (counts.isEmpty) exhausted = true // fixpoint: identity rounds
      else {
        var best: (String, String) = null
        var bestC = Long.MinValue
        counts.foreach { case (p, c) =>
          if (c > bestC || (c == bestC &&
              (utf8Lt(p._1, best._1) ||
                (p._1 == best._1 && utf8Lt(p._2, best._2)))))
            { best = p; bestC = c }
        }
        merges += best
        val (a, b) = best
        val touched = where.getOrElse(best, mutable.Set.empty).toArray
        touched.foreach { wi =>
          delWord(wi) // retire the word's old pair contributions
          val s = words(wi)
          val out = new mutable.ArrayBuffer[String](s.length)
          var j = 0
          while (j < s.length) {
            if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
              out += a + b; j += 2
            } else { out += s(j); j += 1 }
          }
          words(wi) = out
          addWord(wi) // and index the merged form
        }
      }
      r += 1
    }
    merges.result()
  }

  /**
   * The 32k-merge trainer loop: [[bpeMergesInMemory]] with the
   * per-round argmax replaced by a LAZY MAX-HEAP pair index. The
   * linear-scan loop is O(rounds × |pairs|) — at a real vocabulary
   * (10⁶ types, ~10⁷ distinct pairs) 32k rounds is ~10¹¹ comparisons,
   * which is why real tokenizer trainers (Sennrich's reference
   * implementation included) index pairs by count. Discipline:
   *
   *  - every count CHANGE pushes a fresh `(count, a, b)` snapshot;
   *    stale snapshots are skipped at pop time by comparing against
   *    the live count (the standard lazy-deletion heap);
   *  - heap order is (count desc, UTF-8 (a,b) asc) — the identical
   *    total order the linear scan's tie-break walks, so the merges
   *    are BIT-IDENTICAL (differential-spec-pinned);
   *  - the heap compacts (rebuilds from live counts) when stale
   *    entries dominate, bounding memory at O(|pairs|).
   *
   * Same inputs/outputs as [[bpeMergesInMemory]]; [[bpeTrainTopK]]
   * serves from this one.
   */
  private[graft] def bpeMergesInMemoryIndexed(
      vocab: Array[(String, Long)], rounds: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words = vocab.map { case (w, _) =>
      val syms = new mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + n)
        i += n
      }
      syms
    }
    val freqs = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // max-heap: greatest = highest count, ties to UTF-8-smallest pair
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String),
                  y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = utf8Cmp(y._2, x._2) // reversed: smaller = greater
          if (a != 0) a else utf8Cmp(y._3, x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def wordPairs(wi: Int): Iterator[(String, String)] = {
      val s = words(wi)
      (0 until s.length - 1).iterator.map(j => (s(j), s(j + 1)))
    }
    // initial counts WITHOUT per-bump pushes (one clean snapshot each)
    words.indices.foreach { wi =>
      wordPairs(wi).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + freqs(wi)
        where.getOrElseUpdate(p, mutable.Set.empty) += wi
      }
    }
    counts.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }
    def bump(p: (String, String), delta: Long): Unit = {
      val c = counts.getOrElse(p, 0L) + delta
      if (c == 0L) counts.remove(p)
      else { counts(p) = c; heap.enqueue((c, p._1, p._2)) }
    }
    def addWord(wi: Int): Unit = wordPairs(wi).foreach { p =>
      bump(p, freqs(wi))
      where.getOrElseUpdate(p, mutable.Set.empty) += wi
    }
    def delWord(wi: Int): Unit = {
      val seen = mutable.Set.empty[(String, String)]
      wordPairs(wi).foreach { p => bump(p, -freqs(wi)); seen += p }
      seen.foreach(p => where.get(p).foreach(_ -= wi))
    }
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      // pop to the first LIVE snapshot — by the push-on-every-change
      // invariant the live count of every pair has a snapshot in the
      // heap, so the first live pop is the true (count, tie) argmax
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (c, a, b) = heap.dequeue()
        if (counts.getOrElse((a, b), Long.MinValue) == c) best = (a, b)
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val (a, b) = best
        val touched = where.getOrElse(best, mutable.Set.empty).toArray
        touched.foreach { wi =>
          delWord(wi)
          val s = words(wi)
          val out = new mutable.ArrayBuffer[String](s.length)
          var j = 0
          while (j < s.length) {
            if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
              out += a + b; j += 2
            } else { out += s(j); j += 1 }
          }
          words(wi) = out
          addWord(wi)
        }
        // re-seed best's live snapshot if it survives with a new count
        counts.get(best).foreach(c => heap.enqueue((c, a, b)))
        // compact when stale snapshots dominate (amortized O(|pairs|))
        if (heap.size > 8 * counts.size + 1024) {
          heap.clear()
          counts.foreach { case ((x, y), c) => heap.enqueue((c, x, y)) }
        }
      }
      r += 1
    }
    merges.result()
  }

  /** Largest merge count served as a codegen'd expression fold: each
    * merge nests one `replace`, and past this depth the generated
    * method approaches the 64 KB JVM bytecode limit / analyzer blowup.
    * Real tokenizers (32k–100k merges) serve through the
    * partition-local path instead ([[bpeEncodeWithLocal]]). */
  val MaxCodegenMerges: Int = 64

  /** Per-document token counts of ANY document frame under a trained
    * model — [[bpeEncode]]'s output schema, computable on documents
    * the trainer never saw. Dispatches on model size (r9 verdict
    * item 2): up to [[MaxCodegenMerges]] merges the segmentation is a
    * pure codegen'd projection ([[bpeEncodeWithFold]]); past that —
    * real vocabularies — the collected merge table applies
    * partition-locally ([[bpeEncodeWithLocal]], the codec
    * `mapPartitions` shape). Both paths are spec-pinned identical on
    * the same model; both are document-local (no shuffle except the
    * doc-keyed rollup, no vocab join) and safe inside `foreachBatch`
    * at any arrival rate. */
  def bpeEncodeWith(docs: DataFrame, model: BpeModel): DataFrame =
    if (model.merges.size <= MaxCodegenMerges) bpeEncodeWithFold(docs, model)
    else bpeEncodeWithLocal(docs, model)

  /** The ≤[[MaxCodegenMerges]] serving path: each word is
    * char-sentinelized and the learned merges fold over it in training
    * order as nested codegen'd `replace`s (the trainer's identical
    * greedy replace, so for in-training words the count is
    * bit-identical to the trained vocab's segmentation). */
  private[operators] def bpeEncodeWithFold(docs: DataFrame,
                                           model: BpeModel): DataFrame = {
    require(model.merges.size <= MaxCodegenMerges,
      s"${model.merges.size} merges cannot serve as a codegen fold — " +
        "use bpeEncodeWithLocal")
    val seg0 = regexp_replace(col("word"), "(?s)(.)", Sent + "$1" + Term)
    val segN = model.merges.foldLeft(seg0) { case (c, (a, b)) =>
      replace(c, lit(Sent + a + Term + Sent + b + Term),
        lit(Sent + a + b + Term))
    }
    // doc_id casts long HERE too so the output schema is identical to
    // bpeEncodeWithLocal's — the dispatch in bpeEncodeWith must not
    // change a column type when a model crosses MaxCodegenMerges
    // (r10 advisory)
    docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(bpeishTokens(col("text"))).as("word"))
      .filter(!col("word").rlike("^" + SpaceRun + "$") &&
        !col("word").contains(Sent) && !col("word").contains(Term))
      .select(col("doc_id"), size_(bpeSyms(segN)).cast("long").as("n_syms"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_tokens"))
  }

  /** Greedy symbol count of one word under a merge list applied in
    * training order — the plain-Scala twin of the codegen fold: per
    * merge, one left-to-right non-overlapping pass over WHOLE adjacent
    * symbols (exactly `replace`'s semantics over the sentinelized
    * form, symbol-exact per the r8 merge-boundary fix). Initial
    * symbols are code points, matching Java-regex `(?s)(.)`. */
  private[operators] def bpeSymCount(word: String,
                                     merges: Seq[(String, String)]): Long = {
    var syms = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      syms += word.substring(i, i + n)
      i += n
    }
    merges.foreach { case (a, b) =>
      if (syms.length > 1) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out
      }
    }
    syms.length.toLong
  }

  /** The real-vocabulary serving path: the collected merge table ships
    * in the task closure (tokenizer METADATA — a 32k-merge model is
    * ~1 MB) and applies partition-locally through the codec
    * `mapPartitions` batch shape, with a per-partition word→count memo
    * (Zipf reuse makes the memo hit rate ~the corpus' type/token
    * ratio; capped so a pathological all-distinct partition can't grow
    * it unbounded). Same output schema and — spec-pinned — the same
    * counts as [[bpeEncodeWithFold]] on any model both can serve. */
  def bpeEncodeWithLocal(docs: DataFrame, model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val merges = model.merges
    docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(bpeishTokens(col("text"))).as("word"))
      .filter(!col("word").rlike("^" + SpaceRun + "$") &&
        !col("word").contains(Sent) && !col("word").contains(Term))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, java.lang.Long]()
        it.map { case (id, w) =>
          var n = memo.get(w)
          if (n == null) {
            n = bpeSymCount(w, merges)
            if (memo.size < 65536) memo.put(w, n)
          }
          (id, n.longValue())
        }
      }
      .toDF("doc_id", "n_syms")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_tokens"))
  }

  /**
   * DSIR-style importance scores — data selection via importance
   * resampling (Xie et al., 2023): rank corpus documents by how much
   * more probable they are under a TARGET domain's unigram LM than
   * under the full-corpus LM, the standard cheap proxy for "select
   * web data that looks like the high-quality target". Per document:
   * `score = Σ_tok m·(bits_corpus − bits_target)` where `bits_X` is
   * the floor-log₂ surprisal under X (the [[unigramSurprisal]]
   * lattice) and the target LM is add-one smoothed (`c+1 / N+V`) so
   * out-of-target tokens cost finitely. All integers — engine-exact.
   *
   * Scale shape: one token-key shuffle builds per-doc·term counts,
   * ONE derived term table carries both LMs (corpus + target counts
   * side by side — the target pass is a conditional sum, not a second
   * scan), totals ride a 1-row broadcast, and the rollup keys by
   * doc_id. Selection downstream is a bounded
   * `orderBy(score).limit(k)` — TakeOrderedAndProject, never a global
   * sort.
   */
  def dsirScores(docs: DataFrame, isTarget: Column): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), isTarget.as("is_target"),
        explode(wordTokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("is_target"), col("tok"))
      .agg(count(lit(1)).as("m"))
    val terms = perDoc.groupBy(col("tok"))
      .agg(sum(col("m")).as("cq"),
        sum(when(col("is_target"), col("m")).otherwise(0L)).as("cp"))
    val totals = terms.agg(sum(col("cq")).as("nq"), sum(col("cp")).as("np"),
      count(lit(1)).as("v"))
    perDoc.join(terms, "tok")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("m"),
        (length(bin(expr("nq div cq"))) - 1).cast("long").as("bits_q"),
        (length(bin(expr("(np + v) div (cp + 1)"))) - 1).cast("long")
          .as("bits_p"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_tokens"),
        sum(col("m") * (col("bits_q") - col("bits_p"))).as("score"))
  }

  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), explode(wordTokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("m"))
    val corpus = perDoc.groupBy(col("tok")).agg(sum(col("m")).as("c"))
    val total = corpus.agg(sum(col("c")).as("n_total"))
    perDoc.join(corpus, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("m"),
        (length(bin(expr("n_total div c"))) - 1).cast("long").as("bits"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_tokens"),
        sum(col("m") * col("bits")).as("sum_bits"))
      .select(col("doc_id"), col("n_tokens"), col("sum_bits"),
        expr("(sum_bits * 1000000) div n_tokens").as("mean_bits_ppm"))
      .orderBy(col("doc_id"))
  }

  /**
   * Duplicated-span detection — the token-level (substring) dedup
   * signal of "Deduplicating Training Data Makes Language Models
   * Better" (Lee et al., 2022), at span granularity: fingerprint every
   * sliding `window`-token span (stride 1), count the DISTINCT
   * documents containing each fingerprint, and report per document how
   * many of its spans also occur elsewhere in the corpus — the signal
   * behind cutting boilerplate/licence/syndication text that exact and
   * whole-doc near-dup both miss. Output: `doc_id, n_spans,
   * n_dup_spans, dup_ppm` (integer parts-per-million — engine-exact).
   *
   * Scale shape: the span explode is a narrow map (|tokens| rows per
   * doc, md5 per span — no substring materializes beyond the span
   * being hashed); the df count and the join back are both keyed by
   * the 128-bit fingerprint (uniform, never skewed), and the final
   * rollup is keyed by doc_id. Nothing sorts globally. At 100 TB this
   * is the documented-cost exact path; MinHash over the same spans is
   * the cheap screen when span-level exactness isn't required.
   */
  def dupSpans(docs: DataFrame, window: Int = 8): DataFrame = {
    val spans = spanTable(docs, window).drop("i")
    val df = spans.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    spans.join(df, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("nd") >= 2, lit(1L)).otherwise(lit(0L)))
          .as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        expr("(n_dup_spans * 1000000) div n_spans").as("dup_ppm"))
      .orderBy(col("doc_id"))
  }

  /** One row per sliding `window`-token span: `(doc_id, i, fp)` with
    * `i` the 1-based start token index and `fp` the md5 of the
    * space-joined span. Slice AFTER the explode, never inside a lambda
    * (same staging rule as chunkSplit). Shared by [[dupSpans]] (doc
    * rollup) and [[dupSpanRuns]] (maximal-run extraction). */
  private def spanTable(docs: DataFrame, window: Int): DataFrame = {
    require(window > 0, s"window=$window")
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size_(col("toks")).as("n"))
      .filter(col("n") >= window)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), col("n") - lit(window - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        md5(concat_ws(" ", slice(col("toks"), col("i"), lit(window))))
          .as("fp"))
      // every consumer reads this twice or more (the fp-df count plus
      // the join/rollup sides), and each re-evaluation re-runs an md5
      // per token position: checkpoint the (doc_id, i, fp) digest
      // stream once — the ngramPairStats finding, span edition
      .localCheckpoint(true)
  }

  /**
   * Maximal shared-substring extraction — the [[dupSpans]] follow-up
   * from Lee et al. (2022): a shared region LONGER than the fixed
   * `window` shows up as a RUN of consecutive duplicated span starts,
   * and chaining those starts recovers the full region without ever
   * materializing a suffix array. Per document: its maximal runs of
   * consecutive duplicated-somewhere span starts, rolled up to
   * `doc_id, n_runs, max_span_tokens, longest_start, dup_tokens` —
   * `max_span_tokens` = `run_len + window − 1` of the longest run
   * (the length in tokens of the longest substring this doc shares
   * with ANY other doc, exact for regions ≥ window), `longest_start`
   * its 1-based token offset (earliest on ties), `dup_tokens` the
   * total token coverage of all duplicated regions. Docs with no
   * duplicated span are absent (nothing to report). All integers —
   * engine-exact.
   *
   * Scale shape: [[spanTable]]'s narrow explode + the fp-keyed df
   * count (same as dupSpans), then ONE doc-keyed window for the
   * gaps-and-islands grouping (`i − row_number`) — per-doc sorts,
   * nothing global. The longest-run argmax packs (span_tokens,
   * −start) into one 64-bit ordering key (`span_tokens·2³¹ − start`,
   * collision-free while docs stay under 2³¹ tokens — any real doc)
   * so both engines pick the same run with a scalar `max_by`.
   */
  def dupSpanRuns(docs: DataFrame, window: Int = 8): DataFrame = {
    val spans = spanTable(docs, window)
    val df = spans.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    val dup = spans.join(df, "fp").filter(col("nd") >= 2)
      .select(col("doc_id"), col("i"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val runs = dup
      .withColumn("grp", col("i") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("i")).cast("long").as("start_i"),
        (count(lit(1)) + lit(window - 1).cast("long")).as("span_tokens"))
    runs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_runs"),
        max(col("span_tokens")).as("max_span_tokens"),
        max_by(col("start_i"),
          col("span_tokens") * lit(2147483648L) - col("start_i"))
          .as("longest_start"),
        sum(col("span_tokens")).as("dup_tokens"))
      .orderBy(col("doc_id"))
  }

  /** One row per (doc, k-gram occurrence) — NON-distinct, position-
    * blind: the raw occurrence stream repetition statistics count
    * over. Same staging rule as chunkSplit: slice AFTER the explode. */
  private def gramOccurrences(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size_(col("toks")).as("n"))
      .filter(col("n") >= k)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), col("n") - lit(k - 1))).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), col("i"), lit(k))).as("g"))

  /**
   * Intra-document repetition profile — the Gopher-style (Rae et al.,
   * 2021) repetition quality filters, the standard "this doc is a
   * degenerate loop" pretraining gate that CROSS-doc dedup never
   * sees: per document, the top-2-gram coverage (`top2_ppm` =
   * occurrences of the most frequent word bigram per total bigram
   * occurrences — high means "the same two words over and over") and
   * the duplicated-4-gram fraction (`dup4_ppm` = occurrences of
   * 4-grams seen more than once in THIS doc, per total — high means
   * repeated phrases/loops). Line/paragraph variants are degenerate
   * on this corpus (no newlines) and omitted. Integer ppm — engine-
   * exact. Docs shorter than 2 tokens are absent (nothing to
   * measure); 4-gram columns are 0 for docs of 2-3 tokens.
   *
   * Scale shape: two occurrence explodes (narrow maps), each
   * aggregated (doc, gram)-keyed with map-side partial counting, then
   * doc-keyed rollups and one doc-keyed left join — no windows, no
   * self-joins, nothing global.
   */
  def repetitionProfile(docs: DataFrame): DataFrame = {
    def rollup(k: Int, prefix: String): DataFrame =
      gramOccurrences(docs, k)
        .groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as(s"n_${prefix}grams"),
          max(col("c")).as(s"max_$prefix"),
          sum(when(col("c") > 1, col("c")).otherwise(lit(0L)))
            .as(s"dup_$prefix"))
    rollup(2, "2").join(rollup(4, "4"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_2grams"),
        expr("(max_2 * 1000000) div n_2grams").as("top2_ppm"),
        coalesce(col("n_4grams"), lit(0L)).as("n_4grams"),
        coalesce(expr("(dup_4 * 1000000) div n_4grams"), lit(0L))
          .as("dup4_ppm"))
      .orderBy(col("doc_id"))
  }

  /**
   * PAIR-level maximal common spans — [[dupSpanRuns]] names how much
   * duplicated text a doc carries; this one names WITH WHOM: for each
   * document pair sharing at least one rare duplicated span, the
   * maximal shared regions, chained exactly. Matched span positions
   * (i_a, i_b) from a shared fingerprint lie on a DIAGONAL
   * (i_a − i_b constant while both docs advance together), so a
   * maximal common substring is a gaps-and-islands run within
   * (pair, diagonal) — the classic dot-plot diagonal chain, computed
   * with one keyed window instead of a suffix automaton. Output per
   * pair: `doc_a, doc_b, n_runs, max_span_tokens, start_a, start_b`
   * (1-based token offsets of the longest shared region, earliest on
   * ties) and `shared_tokens` (coverage summed per diagonal run;
   * overlapping runs on DIFFERENT diagonals each count — the honest
   * repeat-structure reading). All integers — engine-exact.
   *
   * Scale shape: the position join is keyed by fingerprint and
   * df-capped at `maxDf` DISTINCT docs (2 ≤ nd ≤ maxDf): spans shared
   * corpus-wide are boilerplate, already measured doc-level by
   * [[dupSpanRuns]], and would otherwise emit C(nd, 2) rows — the
   * same stop-gram discipline as every pair operator here. The
   * islands window partitions by (pair, diagonal) — bounded by the
   * shorter doc, never data-sized.
   */
  def dupSpanPairs(docs: DataFrame, window: Int = 8,
                   maxDf: Int = 16): DataFrame = {
    val spans = spanTable(docs, window)
    val df = spans.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= maxDf)
      .select(col("fp"))
    // both self-join sides read the capped stream — checkpoint once;
    // and the fp self-join explodes ≤ maxDf×, so spread the stream
    // side past AQE's pre-join-bytes coalescing (the
    // Graph.cooccurrenceEdges trap)
    val capped = spans.join(df, "fp").localCheckpoint(true)
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    val a = capped.repartition(nPart, col("fp"))
      .select(col("fp"), col("doc_id").as("doc_a"),
        col("i").cast("long").as("ia"))
    val b = capped.select(col("fp"), col("doc_id").as("doc_b"),
      col("i").cast("long").as("ib"))
    val matched = a.join(b, "fp").filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ia"), col("ib"),
        (col("ia") - col("ib")).as("diag"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("ia"))
    val runs = matched
      .withColumn("grp", col("ia") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(min(col("ia")).as("sa"),
        (count(lit(1)) + lit(window - 1).cast("long")).as("span_tokens"))
    runs.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_runs"),
        max(col("span_tokens")).as("max_span_tokens"),
        // (span desc, s_a asc, s_b asc) packed into one 63-bit scalar
        // key (span·2⁴² − s_a·2²¹ − s_b): injective while docs stay
        // under 2²¹ tokens, so both engines pick the same run with a
        // scalar max_by/arg_max — two equal-length runs CAN share s_a
        // on different diagonals, so s_b must be in the tie-break
        max_by(struct(col("sa").as("s_a"),
            (col("sa") - col("diag")).as("s_b")),
          col("span_tokens") * lit(4398046511104L) -
            col("sa") * lit(2097152L) - (col("sa") - col("diag")))
          .as("m"),
        sum(col("span_tokens")).as("shared_tokens"))
      .select(col("doc_a"), col("doc_b"), col("n_runs"),
        col("max_span_tokens"), col("m.s_a").as("start_a"),
        col("m.s_b").as("start_b"), col("shared_tokens"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c)

  /**
   * Deterministic global shuffle for training order: each document is
   * assigned a shard (`h60(doc_id:salt) mod nShards`) and a position
   * within it (rank of the hash). A pure function of the data — re-runs
   * and engines agree — and shard-parallel at any scale: one shuffle
   * keyed by shard, each shard's sort is independent (at 100 TB,
   * `repartitionByRange` + `sortWithinPartitions` shape; never a
   * single global sort).
   */
  def shardAssign(docs: DataFrame, nShards: Int = 8,
                  salt: String = "graft",
                  carry: Seq[String] = Nil): DataFrame = {
    // `carry` threads manifest columns through in the same pass —
    // distilledCorpus carries (source, n_tokens) so the shard window
    // runs once over the selected set instead of via a self-join
    val h = graft.functions.functions.h60(
      concat(col("doc_id").cast("string"), lit(":"), lit(salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col("doc_id"))
    docs.select(col("doc_id") +: carry.map(col) :+
        pmod(h, lit(nShards.toLong)).cast("int").as("shard") :+
        h.as("__h"): _*)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
      .orderBy(col("shard"), col("pos"))
  }

  /**
   * Concat-and-chunk sequence-packing PLAN — the training-layout step
   * after curation: documents are (conceptually) concatenated in a
   * deterministic hash order within each shard and sliced into fixed
   * `budget`-token training sequences, the standard LLM pretraining
   * layout (docs may split across sequence boundaries; nothing is
   * padded or wasted, unlike greedy first-fit bins). This emits the
   * plan only — per document its shard, pack position, token offsets
   * and the `[first_seq, last_seq]` range it lands in — so the writer
   * that later streams text into sequence files is a pure lookup; no
   * text moves here.
   *
   * Determinism: order within a shard is (h60(doc_id:salt), doc_id) —
   * re-partitioning and re-runs give byte-identical plans, and the
   * salt re-shuffles the curriculum without touching data. Zero-token
   * docs carry no trainable content and are excluded from the plan.
   *
   * Scale shape: one row per doc through a (shard)-keyed window —
   * `nShards` bounded-size sorts, no global order; both the running
   * offset and the position ride the SAME window sort. At 100 TB,
   * pick nShards ≈ cluster parallelism; each shard's plan is
   * independent, so writers scale with shards.
   */
  def packSequences(docs: DataFrame, budget: Long = 512L,
                    nShards: Int = 8, salt: String = "graft"): DataFrame =
    packSequencesCounts(
      docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens")),
      budget, nShards, salt)

  /** [[packSequences]] over a precomputed `(doc_id, n_tokens)` budget
    * frame — the packing plan is independent of HOW tokens were
    * counted, so any tokenizer (whitespace, [[bpeEncode]]'s learned
    * segmentation, an external count column) feeds the same
    * shard-keyed window. */
  def packSequencesCounts(counts: DataFrame, budget: Long = 512L,
                          nShards: Int = 8,
                          salt: String = "graft"): DataFrame = {
    require(budget >= 1, s"packSequences budget=$budget")
    require(nShards >= 1, s"packSequences nShards=$nShards")
    val h = graft.functions.functions.h60(
      concat(col("doc_id").cast("string"), lit(":"), lit(salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col("doc_id"))
    counts.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        pmod(h, lit(nShards.toLong)).cast("int").as("shard"), h.as("__h"))
      .filter(col("n_tokens") > 0)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("end_off", sum(col("n_tokens")).over(w)) // inclusive
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"),
        (col("end_off") - col("n_tokens")).as("start_off"),
        expr(s"(end_off - n_tokens) div $budget").as("first_seq"),
        expr(s"(end_off - 1) div $budget").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + lit(1L))
      .orderBy(col("shard"), col("pos"))
  }

  /** The pretraining layout under the LEARNED tokenizer: sequence
    * packing budgeted by [[bpeEncode]]'s per-doc token counts instead
    * of whitespace counts — the composition a real run executes
    * (corpus → learn merges → count → pack). Same one-window scale
    * shape; the budgets ride the vocab join. */
  def packSequencesBpe(docs: DataFrame, merges: Int = 8,
                       budget: Long = 512L, nShards: Int = 8,
                       salt: String = "graft"): DataFrame =
    packSequencesCounts(
      bpeEncode(docs, merges).select(col("doc_id"), col("n_tokens")),
      budget, nShards, salt)

  /**
   * BM25 keyword retrieval over the corpus, top-`k` documents for one
   * bag of query terms — the classic Robertson–Spärck Jones ranking
   * (k1 = 1.2, b = 0.75) re-expressed on the engine's exact integer
   * lattice so the score replays bit-for-bit in any engine:
   *
   *  - idf rides the floor-log₂ lattice (same discipline as
   *    [[unigramSurprisal]]): `w = length(bin((2N−2df+1) div (2df+1)))`
   *    = 1 + ⌊log₂((N−df+½)/(df+½))⌋, clamped to ≥ 1 for terms in
   *    more than half the corpus (bin(0) = "0"). Integer-exact — no
   *    transcendental log whose last bit could differ across engines.
   *  - the tf/length normalization `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
   *    is cleared of fractions by multiplying through by 10·L (L =
   *    total corpus tokens, avgdl = L/N):
   *    `contrib = w · (22·tf·L·10⁶) div (10·L·tf + 3·L + 9·dl·N)`,
   *    computed in DECIMAL(38,0) so 22·tf·L·10⁶ cannot wrap even at
   *    100 TB token counts (the Long envelope dies at L ≈ 4·10¹¹).
   *
   * Scale shape: the posting list (`tf`) is filtered to the query
   * terms BEFORE its groupBy, so the per-term shuffle carries only
   * matching occurrences; `df` aggregates that already-tiny table;
   * corpus constants (N, L) are one broadcast row; the final ranking
   * is a bounded `orderBy.limit` (TakeOrderedAndProject — k rows per
   * partition cross the wire, never a global sort).
   */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String],
               k: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val toks = docs.select(col("doc_id"),
      explode(wordTokens(col("text"))).as("term"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        length(bin(expr("(2*n_docs - 2*df + 1) div (2*df + 1)")))
          .cast("long").as("w"),
        expr("""(22 * cast(tf as decimal(38,0)) * total_len * 1000000)
                div (10 * cast(total_len as decimal(38,0)) * tf
                     + 3 * total_len
                     + 9 * cast(dl as decimal(38,0)) * n_docs)""").as("tfn"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w") * col("tfn")).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    // rank materializes on the k-row result of the bounded limit —
    // the window never sees the corpus
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("score"), col("n_terms"))
      .orderBy(col("rank"))
  }

  /**
   * Zipf / vocabulary profile — the corpus-level diagnostic a curator
   * reads before trusting any frequency-based filter: term counts
   * bucketed into log₂ octaves (`freq_bits = ⌊log₂ c⌋`), with the
   * number of distinct terms and total token mass per octave. A
   * Zipfian corpus halves `n_terms` per octave (slope ≈ −1 in
   * log-log); a bot-inflated or boilerplate-heavy crawl shows up as
   * mass bulges in the high octaves, OCR noise as a bloated octave 0.
   *
   * Scale shape: one token-keyed agg (map-side combined) then a
   * ~60-row octave agg — the whole output is O(log N) rows no matter
   * the corpus, and the octave table merges across shards by
   * re-summing (the same mergeability argument as the log₂ value
   * histogram).
   */
  def zipfProfile(docs: DataFrame): DataFrame =
    docs.select(explode(wordTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .groupBy((length(bin(col("c"))) - 1).cast("long").as("freq_bits"))
      .agg(count(lit(1)).as("n_terms"), sum(col("c")).as("n_tokens"))
      .orderBy(col("freq_bits"))

  /**
   * Document-level CONDITIONAL bigram cross-entropy — the
   * perplexity-style quality filter ([[unigramSurprisal]]'s LM
   * upgrade): each bigram occurrence (w1, w2) in a document costs
   * `bits = ⌊log₂(c(w1) / c(w1,w2))⌋` under the corpus MLE bigram
   * model P(w2|w1) = c(w1,w2)/c(w1) (floor-log₂ = `length(bin(x))−1`
   * on the integer ratio, the repo-wide exact-lattice discipline).
   * Output per doc: bigram count, total bits, and mean bits in
   * parts-per-million. Low mean bits = predictable text (boilerplate,
   * lists); high = incoherent or heavily OOV text — both tails are
   * what a curator trims.
   *
   * Scale shape: one shuffle of the per-doc bigram stream on the
   * bigram key (map-side combined), joined to the corpus bigram TYPE
   * table (built from the same stream, one more keyed agg over types
   * — never re-tokenizes), left counts derived from the type table.
   * Every subsequent agg is doc-keyed. No windows, no self-joins,
   * counts stay in Long (bits ≤ 63 by construction since
   * c(w1,w2) ≤ c(w1)).
   */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    val perDoc = docs
      .select(col("doc_id"), wordTokens(col("text")).as("toks"))
      .select(col("doc_id"), zip_with(
        slice(toks, lit(1), greatest(size_(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size_(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))).as("bg"))
      .select(col("doc_id"), explode(col("bg")).as("bg"))
      .groupBy(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("m"))
    val corpus = perDoc.groupBy(col("w1"), col("w2"))
      .agg(sum(col("m")).as("c"))
    val left = corpus.groupBy(col("w1")).agg(sum(col("c")).as("c_w1"))
    perDoc.join(corpus, Seq("w1", "w2")).join(left, "w1")
      .select(col("doc_id"), col("m"),
        (length(bin(expr("c_w1 div c"))) - 1).cast("long").as("bits"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * col("bits")).as("sum_bits"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_bits"),
        expr("(sum_bits * 1000000) div n_bigrams").as("mean_bits_ppm"))
      .orderBy(col("doc_id"))
  }

  /**
   * CCNet-style LM quality scoring (Wenzek et al. 2020, the public
   * recipe behind CC-Net/RedPajama corpus filtering): train a bigram
   * LM on a REFERENCE half of the corpus (CCNet uses Wikipedia; the
   * deterministic h60 split stands in — the shape is identical),
   * score every held-out document by mean surprisal, and let
   * [[lmBuckets]] cut head/middle/tail. The lattice is INTEGER
   * end-to-end (the repo's floor-log₂ device — `length(bin(x))−1`):
   * a seen bigram costs ⌊log₂(c_w1/c)⌋ bits; an unseen bigram backs
   * off to the train-side continuation unigram at
   * ⌊log₂(N/c_w2)⌋ + `backoffBits`; an OOV word costs flat
   * `oovBits`. Emitting exact integer bits instead of float
   * perplexity keeps the oracle comparison engine-exact — the
   * ranking CCNet needs survives the quantization (its buckets are
   * coarse by design).
   *
   * Scale shape: ONE token-stream shuffle per side on the bigram key
   * (map-side combined); the LM is a TYPE table (≪ tokens) joined
   * keyed — AQE broadcasts it when small; the single-row total rides
   * an explicit broadcast. No windows, no global sort.
   */
  def lmScoreHeldout(docs: DataFrame, trainPct: Int = 50,
                     salt: String = "ccnet", backoffBits: Long = 4L,
                     oovBits: Long = 20L): DataFrame = {
    val toks = col("toks")
    def docBigrams(d: DataFrame) = d
      .select(col("doc_id"), wordTokens(col("text")).as("toks"))
      .select(col("doc_id"), zip_with(
        slice(toks, lit(1), greatest(size_(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size_(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))).as("bg"))
      .select(col("doc_id"), explode(col("bg")).as("bg"))
      .groupBy(col("doc_id"), col("bg.w1").as("w1"),
        col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("m"))
    // the train-side bigram TYPE table is referenced FOUR times below
    // (seen-bigram join, left-context counts, continuation unigrams,
    // corpus total); a lazy localCheckpoint materializes it once at
    // first action and every reference reads the same blocks — without
    // it each reference re-tokenizes and re-aggregates the whole train
    // half (4 parquet scans + 4 token-stream shuffles in the plan)
    val lmBg = docBigrams(
        docs.filter(samplePredicate(col("doc_id"), trainPct, salt)))
      .groupBy(col("w1"), col("w2")).agg(sum(col("m")).as("c"))
      .localCheckpoint(true)
    val lmLeft = lmBg.groupBy(col("w1")).agg(sum(col("c")).as("c_w1"))
    val lmSeen = lmBg.join(lmLeft, "w1")
      .select(col("w1"), col("w2"),
        (length(bin(expr("c_w1 div c"))) - 1).cast("long")
          .as("bits_bg"))
    val lmRight = lmBg.groupBy(col("w2")).agg(sum(col("c")).as("c_w2"))
    val totalN = lmBg.agg(sum(col("c")).as("n_total"))
    val lmUni = lmRight.crossJoin(broadcast(totalN))
      .select(col("w2"),
        (length(bin(expr("n_total div c_w2"))) - 1 + backoffBits)
          .cast("long").as("bits_uni"))
    docBigrams(
        docs.filter(!samplePredicate(col("doc_id"), trainPct, salt)))
      .join(lmSeen, Seq("w1", "w2"), "left_outer")
      .join(lmUni, Seq("w2"), "left_outer")
      .select(col("doc_id"), col("m"),
        coalesce(col("bits_bg"), col("bits_uni"), lit(oovBits))
          .as("bits"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * col("bits")).as("sum_bits"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_bits"),
        expr("(sum_bits * 1000000) div n_bigrams").as("mean_bits_ppm"))
  }

  /** CCNet's head/middle/tail cut over [[lmScoreHeldout]] output.
    * The thresholds are CALLER-PROVIDED integer ppm cutoffs — CCNet
    * publishes per-language percentile cutoffs computed offline,
    * exactly this contract; deriving them in-plan would need a
    * global order statistic no 100 TB pass should pay for. */
  def lmBuckets(scored: DataFrame, headMaxPpm: Long,
                tailMinPpm: Long): DataFrame = {
    require(headMaxPpm <= tailMinPpm, "head cutoff above tail cutoff")
    scored.withColumn("bucket",
      when(col("mean_bits_ppm") < headMaxPpm, "head")
        .when(col("mean_bits_ppm") >= tailMinPpm, "tail")
        .otherwise("middle"))
  }

  /**
   * PMI collocation mining — the `topN` word bigrams whose corpus
   * count most exceeds independence, PMI = log₂(N·c(ab)/(c(a)·c(b))):
   * the classic multi-word-expression extractor ("new york",
   * "machine learning") a pipeline runs to build tokenizer seed
   * vocabularies and phrase tables. Only bigrams with
   * `c(ab) ≥ minCount` (rare-pair PMI is noise — one co-occurrence of
   * two rare words maximizes the raw ratio) and PMI ≥ 0 qualify.
   * Exact lattice: the ratio is computed as
   * `(N·c_ab) div (c_a·c_b)` in DECIMAL(38,0) — at 100 TB
   * N ~ 10¹³ and the products overflow Long, so the lattice goes
   * through decimal exactly like [[bm25TopK]]'s normalizer —
   * `pmi_bits = ⌊log₂ ratio⌋`, ties broken on the exact ratio then
   * lexicographically.
   *
   * Scale shape: unigram and bigram counts are two keyed aggs over
   * the token stream (map-side combined); the score join is
   * bigram-type-keyed (types ≪ tokens) with the unigram table joined
   * twice by key; the final ranking is a bounded orderBy.limit
   * (TakeOrderedAndProject — never a global sort of the type table).
   */
  def pmiCollocations(docs: DataFrame, minCount: Int = 5,
                      topN: Int = 50): DataFrame = {
    require(minCount >= 1 && topN >= 1, s"pmi($minCount, $topN)")
    val toks = col("toks")
    val bigrams = docs
      .select(wordTokens(col("text")).as("toks"))
      .select(zip_with(
        slice(toks, lit(1), greatest(size_(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size_(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))).as("bg"))
      .select(explode(col("bg")).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c_ab"))
    // contingency-table marginals on the bigram event space: c_a =
    // Σ_b c(a,·) (left), c_b = Σ_a c(·,b) (right), N = Σ c_ab — the
    // exact PMI of the pair-occurrence distribution, no re-tokenize
    val leftM = bigrams.groupBy(col("w1")).agg(sum(col("c_ab")).as("c_a"))
    val rightM = bigrams.groupBy(col("w2")).agg(sum(col("c_ab")).as("c_b"))
    val total = leftM.agg(sum(col("c_a")).as("n_total"))
    bigrams
      .join(leftM, "w1")
      .join(rightM, "w2")
      .crossJoin(broadcast(total))
      .filter(col("c_ab") >= minCount)
      .select(col("w1"), col("w2"), col("c_ab"),
        expr("""(cast(n_total as decimal(38,0)) * c_ab)
                div (cast(c_a as decimal(38,0)) * c_b)""").as("ratio"))
      .filter(col("ratio") >= 1)
      .select(col("w1"), col("w2"), col("c_ab"),
        (length(bin(col("ratio").cast("long"))) - 1).cast("long")
          .as("pmi_bits"), col("ratio").cast("long").as("ratio_floor"))
      .orderBy(col("ratio_floor").desc, col("c_ab").desc,
        col("w1"), col("w2"))
      .limit(topN)
  }

  /**
   * Generalization ladder for [[kAnonymity]] — the remediation side:
   * for each candidate length-bin width the class count, the number of
   * classes still under `kMin`, and the documents they strand, so the
   * release pipeline can read off the COARSEST quasi-identifier
   * granularity that reaches k-anonymity (or see that none on the
   * ladder does and suppression is required).
   *
   * Scale shape: widths explode a constant ≤|ladder| fan-out over the
   * metadata columns only (text never moves), then two keyed
   * aggregates — classes, then per-width rollup to |ladder| rows.
   */
  def kAnonymityLadder(docs: DataFrame, kMin: Long = 5L,
                       widths: Seq[Long] = Seq(256L, 512L, 1024L, 2048L))
      : DataFrame = {
    require(kMin >= 1 && widths.nonEmpty && widths.forall(_ >= 1),
      s"kMin=$kMin widths=$widths")
    val classes = docs
      .select(col("lang"), col("source"), col("n_chars"),
        explode(array(widths.map(lit): _*)).as("width"))
      .select(col("width"), col("lang"), col("source"),
        (col("n_chars") - pmod(col("n_chars"), col("width"))).as("bin"))
      .groupBy(col("width"), col("lang"), col("source"), col("bin"))
      .agg(count(lit(1)).as("n"))
    classes.groupBy(col("width"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < kMin, 1L).otherwise(0L)).as("n_at_risk"),
        sum(when(col("n") < kMin, col("n")).otherwise(0L))
          .as("docs_at_risk"))
      .orderBy(col("width"))
  }

  /**
   * k-anonymity audit over the corpus metadata — the privacy-side
   * complement of the PII scrub: documents are grouped into
   * equivalence classes by their quasi-identifier tuple
   * (lang, source, length bucket of `binWidth` chars); any class with
   * fewer than `kMin` members is re-identifiable under linkage attack
   * and gets flagged. Output is the full class table (size, flag, and
   * the class's share of the corpus in ppm), so both the release
   * decision ("suppress the at-risk classes") and the utility cost
   * ("how many documents would that drop") read off one result.
   *
   * Scale shape: one keyed aggregate to the class table (bounded by
   * the quasi-identifier cross-product, ≪ corpus) plus a broadcast
   * single-row total; no window, no self-join.
   */
  def kAnonymity(docs: DataFrame, kMin: Long = 5L,
                 binWidth: Long = 256L): DataFrame = {
    require(kMin >= 1 && binWidth >= 1, s"kMin=$kMin binWidth=$binWidth")
    val classes = docs
      .select(col("lang"), col("source"),
        (col("n_chars") - pmod(col("n_chars"), lit(binWidth))).as("chars_bin"))
      .groupBy(col("lang"), col("source"), col("chars_bin"))
      .agg(count(lit(1)).as("n"))
    val total = docs.select(count(lit(1)).as("n_total"))
    classes.crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("chars_bin"), col("n"),
        (col("n") < kMin).cast("long").as("at_risk"),
        expr("(n * 1000000) div n_total").as("share_ppm"))
      .orderBy(col("lang"), col("source"), col("chars_bin"))
  }

  /** The composed C4-style keep/drop decision as one boolean column —
    * length gate AND mean-token-length gate AND stopword-density gate.
    * Shared (not re-derived) by `text_filter_verdict` and the NB
    * classifier's training label, so the distillation target can never
    * drift from the filter it distills. */
  def filterKeep(text: Column): Column = {
    val toks = wordTokens(text)
    val nTok = greatest(size(toks).cast("double"), lit(1.0))
    val ratio = stopwordCount(toks).cast("double") / nTok
    val avgLen = totalTokenLen(toks).cast("double") / nTok
    length(coalesce(text, lit(""))).between(20, 100000) &&
      avgLen.between(2.0, 12.0) && ratio > 0.01
  }

  /**
   * Naive-Bayes quality classifier distilled from [[filterKeep]] — the
   * classic learned-filter pipeline stage (train a cheap classifier on
   * a heuristic's labels, then let it generalize), with EVERY model
   * statistic on the integer floor-log₂ lattice
   * (`length(bin(x)) − 1`, the [[unigramSurprisal]] trick): no
   * floating `log` ever runs, so Spark and the DuckDB oracle agree
   * bit-for-bit on weights, scores, and verdicts.
   *
   * Split: docs whose `h60(doc_id:nbsplit) mod 100 < trainPct` train
   * the model; the classifier scores only the HELD-OUT complement
   * (leakage-safe by construction — same membership discipline as
   * [[hashSample]]). Model: per class c ∈ {keep, drop}, word-token
   * counts c_t, class totals N_c, train-wide vocab size V, and doc
   * priors n_c. Laplace-smoothed per-token surprisal in floor bits:
   * `bits_c(t) = floor(log₂((N_c + V) div (c_t + 1)))`; class prior
   * `floor(log₂((n_train + 2) div (n_c + 1)))`. A document's class
   * score is prior + Σ occurrences·bits; `predicted_keep` iff its keep
   * score is strictly below its drop score (lower surprisal = more
   * likely; exact ties fall to drop, the conservative side). Unseen
   * tokens hit the smoothing floor via the left join's 0-fill.
   *
   * Output: `doc_id, label_keep, n_tokens, bits_keep, bits_drop,
   * predicted_keep` for every held-out document (token-free docs
   * appear with prior-only scores).
   *
   * Scale shape: one exploded keyed aggregate per side; the model
   * (distinct train tokens × two counts) is df-capped at scale
   * ([[nbTrain]]'s `minCount` — a RAW vocabulary is hapax-dominated and
   * grows with the corpus) so the score-side join broadcasts at any
   * corpus size, and the totals ride single-row broadcast crossJoins.
   * Stopword-grade hot tokens are AQE-skew territory, same as the
   * surprisal family. No window, no self-join, nothing driver-side.
   */
  def nbClassifier(docs: DataFrame, trainPct: Int = 50,
                   minCount: Long = 1L): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct=$trainPct")
    nbScore(
      docs.filter(!samplePredicate(col("doc_id"), trainPct, "nbsplit")),
      nbTrain(docs, trainPct, minCount))
  }

  /** A trained NB model. `cnt` is frequent-token-vocabulary-sized
    * under [[nbTrain]]'s `minCount` cap; `tot` and `prior` are single
    * rows — all broadcast-sized. The frames are LAZY plans over the
    * training corpus: one-shot batch scoring can use them as-is, but
    * repeated scoring (the `foreachBatch` ingest path) MUST pin them
    * first via [[cached]] or every micro-batch re-runs training. */
  final case class NbModel(cnt: DataFrame, tot: DataFrame,
                           prior: DataFrame) {
    /** Persist the three model frames for repeated scoring. */
    def cached(): NbModel = NbModel(cnt.persist(), tot.persist(),
      prior.persist())
    /** Drop the pinned frames when the scoring job is done. */
    def release(): Unit = {
      cnt.unpersist(); tot.unpersist(); prior.unpersist(); ()
    }
  }

  /** floor(log₂(e)) as a BIGINT column — `length(bin(e)) − 1`, the
    * integer-lattice log shared by all four NB bit expressions. */
  private def floorBits(e: String): Column =
    expr(s"CAST(length(bin($e)) - 1 AS BIGINT)")

  /** Label + word-token staging shared by the train and score sides. */
  private def nbStage(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      filterKeep(col("text")).as("label_keep"),
      wordTokens(col("text")).as("__wt"))

  /** Train the floor-bit NB model on the h60-under-`trainPct` half of
    * `docs` (see [[nbClassifier]] for the model's arithmetic).
    *
    * `minCount` is the 100 TB dial (collection-frequency threshold,
    * fastText's name — NOT document frequency: it sums occurrences
    * across documents): a raw corpus vocabulary is
    * hapax-dominated and grows ~linearly with the corpus, so an
    * UNCAPPED model table is NOT broadcast-able at scale. Capping
    * keeps only tokens with total train count ≥ `minCount` (fastText's
    * `minCount`); a dropped token scores as unseen — exactly the
    * Laplace smoothing floor its count was one step above, so the
    * capped model diverges only on the rarest tokens while the table
    * shrinks to the frequent-token vocabulary (sublinear in the
    * corpus, broadcast-able again). Totals (`N_c`, `v`) and priors
    * stay UNCAPPED — they are the smoothing denominators of the true
    * distribution, not of the sparse representation. The hash-gated
    * queries run `minCount = 1` (exact model); the cap is spec-pinned.
    */
  def nbTrain(docs: DataFrame, trainPct: Int = 50,
              minCount: Long = 1L): NbModel = {
    require(minCount >= 1L, s"minCount=$minCount")
    val train = nbStage(docs)
      .filter(samplePredicate(col("doc_id"), trainPct, "nbsplit"))
    // model: per-token class counts (df-capped at scale, see above)
    val cntFull = train
      .select(col("label_keep"), explode(col("__wt")).as("tok"))
      .groupBy(col("tok"))
      .agg(sum(when(col("label_keep"), lit(1L)).otherwise(lit(0L)))
            .as("c_keep"),
        sum(when(col("label_keep"), lit(0L)).otherwise(lit(1L)))
            .as("c_drop"))
    val cnt = if (minCount == 1L) cntFull
      else cntFull.filter(col("c_keep") + col("c_drop") >= minCount)
    val tot = cntFull.agg(
      coalesce(sum(col("c_keep")), lit(0L)).as("n_keep_toks"),
      coalesce(sum(col("c_drop")), lit(0L)).as("n_drop_toks"),
      count(lit(1)).as("v"))
    val prior = train.agg(
      count(lit(1)).as("n_train"),
      coalesce(sum(when(col("label_keep"), lit(1L)).otherwise(lit(0L))),
        lit(0L)).as("n_keep_docs"))
    NbModel(cnt, tot, prior)
  }

  /**
   * Score ANY document frame under a trained model — the corpus the
   * model was distilled on, a different source, or an arriving
   * micro-batch (scoring is document-local, so the streaming ingest
   * path applies it per micro-batch inside `foreachBatch`; every model
   * join broadcasts). For repeated scoring, pin the model with
   * [[NbModel.cached]] first — the model frames are lazy plans, and an
   * unpinned model re-runs the whole training aggregation on every
   * micro-batch. Output schema is [[nbClassifier]]'s.
   */
  def nbScore(docs: DataFrame, model: NbModel): DataFrame = {
    val staged = nbStage(docs)
    val scored = staged
      .select(col("doc_id"), explode(col("__wt")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("m"))
      .join(broadcast(model.cnt), Seq("tok"), "left")
      .na.fill(0L, Seq("c_keep", "c_drop"))
      .crossJoin(broadcast(model.tot))
      .withColumn("bits_k", floorBits("(n_keep_toks + v) div (c_keep + 1)"))
      .withColumn("bits_d", floorBits("(n_drop_toks + v) div (c_drop + 1)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_tokens"),
        sum(col("m") * col("bits_k")).as("tb_keep"),
        sum(col("m") * col("bits_d")).as("tb_drop"))

    staged.select(col("doc_id"), col("label_keep"))
      .join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_tokens", "tb_keep", "tb_drop"))
      .crossJoin(broadcast(model.prior))
      .select(col("doc_id"), col("label_keep"), col("n_tokens"),
        (floorBits("(n_train + 2) div (n_keep_docs + 1)")
          + col("tb_keep")).as("bits_keep"),
        (floorBits("(n_train + 2) div (n_train - n_keep_docs + 1)")
          + col("tb_drop")).as("bits_drop"))
      .withColumn("predicted_keep", col("bits_keep") < col("bits_drop"))
  }

  /**
   * Hashed n-gram features — the fastText/DCLM representation (r13
   * verdict item 6; public recipe per Joulin et al. 2016 §2 and the
   * DCLM baseline filter): unigrams plus adjacent-pair bigrams of
   * [[wordTokens]], each hashed to `h60(gram) mod nBuckets`. The
   * hashing trick bounds the feature space at `nBuckets` REGARDLESS
   * of corpus vocabulary — a raw vocabulary is hapax-dominated and
   * grows with the corpus (the [[nbTrain]] `minCount` discussion),
   * but the hashed model is a fixed-length weight vector, driver-
   * holdable like the BPE merge table at any corpus size. Returns
   * `(doc_id, bucket, m)` occurrence counts — one exploded keyed
   * aggregate, the [[nbScore]] scale shape.
   */
  def hashedGramCounts(docs: DataFrame,
                       nBuckets: Int = 4096): DataFrame = {
    require(nBuckets > 0, s"nBuckets=$nBuckets")
    // tokenize in a SEPARATE projection: the generator expression
    // below references the token array five times (concat, size, two
    // slices), GenerateExec does no subexpression elimination, and
    // CollapseProject refuses to inline a non-cheap expression used
    // more than once — so this split pins regexp_extract_all to ONE
    // evaluation per row instead of five (the r2 expensive-expression
    // rule, generator edition)
    val wt = col("__toks")
    val bigrams = when(size(wt) >= 2,
      zip_with(slice(wt, lit(1), size(wt) - 1),
        slice(wt, lit(2), size(wt) - 1),
        (a, b) => concat(a, lit("_"), b)))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), wordTokens(col("text")).as("__toks"))
      .select(col("doc_id"),
        explode(concat(wt, bigrams)).as("gram"))
      .select(col("doc_id"),
        pmod(graft.functions.functions.h60(col("gram")),
          lit(nBuckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("m"))
  }

  /**
   * DETERMINISTIC hashed-ngram quality model — the exactly-replayable
   * twin of [[trainQualityLr]] (the `sim_kmeans_assign` playbook: the
   * learned float variant gets a spec-pinned accuracy floor, the
   * integer-lattice variant gets the hash gate): a LINEAR classifier
   * over [[hashedGramCounts]] whose per-bucket weight is the
   * floor-bit Naive-Bayes log-odds — `w(b) = bits_drop(b) −
   * bits_keep(b)` on the [[nbClassifier]] lattice (Laplace-smoothed,
   * `floor(log₂)` via `length(bin(x))−1`, no floating `log` ever
   * runs) — and whose intercept is the prior-bits difference. NB
   * log-odds IS a valid linear weight assignment (what fastText
   * converges toward on count features), so the model scores as
   * `w0 + Σ m_b·w(b)`, predict keep iff the score is positive.
   *
   * Labels distill [[filterKeep]]; the h60-under-`trainPct` half
   * (salt `qhsplit`) trains. Output: one row per bucket
   * `(bucket, c_keep, c_drop, w)` — DENSE over all `nBuckets` (an
   * unseen bucket's weight is the smoothing floor, not 0), so the
   * table is exactly the fixed-length weight vector, broadcast-sized
   * by construction.
   */
  def hashedQualityWeights(docs: DataFrame, nBuckets: Int = 4096,
                           trainPct: Int = 50): DataFrame = {
    val train = docs
      .filter(samplePredicate(col("doc_id"), trainPct, "qhsplit"))
    val labeled = train.select(col("doc_id"),
      filterKeep(col("text")).as("label_keep"))
    val cnt = hashedGramCounts(train, nBuckets)
      .join(labeled, Seq("doc_id"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("label_keep"), col("m")).otherwise(lit(0L)))
          .as("c_keep"),
        sum(when(col("label_keep"), lit(0L)).otherwise(col("m")))
          .as("c_drop"))
    val tot = cnt.agg(
      coalesce(sum(col("c_keep")), lit(0L)).as("n_keep_toks"),
      coalesce(sum(col("c_drop")), lit(0L)).as("n_drop_toks"),
      count(lit(1)).as("v"))
    docs.sparkSession.range(nBuckets).select(col("id").as("bucket"))
      .join(cnt, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_keep", "c_drop"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("c_keep"), col("c_drop"),
        (floorBits("(n_drop_toks + v) div (c_drop + 1)")
          - floorBits("(n_keep_toks + v) div (c_keep + 1)")).as("w"))
  }

  /** The intercept of [[hashedQualityWeights]]' model: prior bits
    * difference `priorDrop − priorKeep` as a single-row frame
    * `(w0, n_train, n_keep_docs)`. */
  def hashedQualityPrior(docs: DataFrame,
                         trainPct: Int = 50): DataFrame =
    docs.filter(samplePredicate(col("doc_id"), trainPct, "qhsplit"))
      .select(filterKeep(col("text")).as("label_keep"))
      .agg(count(lit(1)).as("n_train"),
        coalesce(sum(when(col("label_keep"), lit(1L))
          .otherwise(lit(0L))), lit(0L)).as("n_keep_docs"))
      .select(
        (floorBits("(n_train + 2) div (n_train - n_keep_docs + 1)")
          - floorBits("(n_train + 2) div (n_keep_docs + 1)")).as("w0"),
        col("n_train"), col("n_keep_docs"))

  /**
   * Score documents under the deterministic hashed model:
   * `score = w0 + Σ m_b·w(b)` over the doc's buckets, predict keep
   * iff positive. One exploded aggregate + a broadcast join against
   * the `nBuckets`-row weight vector + a single-row intercept
   * crossJoin — gram-free documents score prior-only via the left
   * join's 0-fill. Every cell integer, exactly oracle-replayable.
   */
  def hashedQualityScore(docs: DataFrame, weights: DataFrame,
                         prior: DataFrame,
                         nBuckets: Int = 4096): DataFrame = {
    val scored = hashedGramCounts(docs, nBuckets)
      .join(broadcast(weights.select(col("bucket"), col("w"))),
        Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_grams"),
        sum(col("m") * col("w")).as("dot"))
    docs.select(col("doc_id"), filterKeep(col("text")).as("label_keep"))
      .join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "dot"))
      .crossJoin(broadcast(prior.select(col("w0"))))
      .select(col("doc_id"), col("label_keep"), col("n_grams"),
        (col("w0") + col("dot")).as("score"))
      .withColumn("predicted_keep", col("score") > 0L)
  }

  /**
   * LEARNED quality classifier — logistic regression over
   * [[hashedGramCounts]] features, the public fastText/DCLM training
   * recipe run in-engine: BATCH gradient descent with the weight
   * vector as DRIVER state (the BPE-trainer pattern — driver memory
   * is `nBuckets + 1` doubles, model-sized, never corpus-sized).
   * Batch gradients are order-independent SUMS over the training
   * half, so the result is deterministic across partitionings and
   * retries — but the arithmetic is floating (sigmoid), so this
   * variant is rows-only at the oracle gate; its accuracy floor and
   * its agreement with the integer twin are spec-pinned
   * (QualityClassifierSpec), the `sim_ivf_topk` discipline.
   *
   * Features are per-doc NORMALIZED counts (`m / Σm`, fastText's
   * mean-of-embeddings shape) so scores stay in sigmoid's useful
   * range regardless of document length. The sparse feature vector is
   * aggregated ONCE into a bucket-sorted per-doc array and cached (one
   * row per train doc); each epoch is then a single narrow pass — the
   * current weight vector rides in as ONE array literal, the per-doc
   * score is an in-row array fold, and the gradient (all buckets plus
   * the intercept as pseudo-bucket −1) comes back from ONE
   * `nBuckets`-sized keyed aggregate. Per epoch: one job, one tiny
   * shuffle, no joins — versus the previous shape's broadcast build +
   * two shuffled aggregates + a residual cache per epoch (measured 3×
   * the CPU at the bench scale factor).
   *
   * Returns `(w0, w)` — intercept and dense weight vector.
   */
  def trainQualityLr(docs: DataFrame, nBuckets: Int = 4096,
                     trainPct: Int = 50, epochs: Int = 10,
                     lr: Double = 2.0): (Double, Array[Double]) = {
    val train = docs
      .filter(samplePredicate(col("doc_id"), trainPct, "qhsplit"))
    val labeled = train.select(col("doc_id"),
      filterKeep(col("text")).cast("double").as("y"))
    // one row per train doc: label + bucket-sorted normalized sparse
    // features (sorting fixes the in-row float fold order, so the
    // trained model is independent of partitioning and retries)
    val staged = hashedGramCounts(train, nBuckets)
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("tm"),
        sort_array(collect_list(struct(col("bucket"), col("m"))))
          .as("bm"))
      .join(labeled, Seq("doc_id"))
      .select(col("y"),
        transform(col("bm"), f => struct(
          f("bucket").cast("int").as("bucket"),
          (f("m").cast("double") / col("tm")).as("x"))).as("fs"))
      .persist()
    val nTrain = math.max(labeled.count(), 1L).toDouble
    var w0 = 0.0
    val w = new Array[Double](nBuckets)
    for (_ <- 1 to epochs) {
      // the model as a single array literal — broadcast-free (the
      // plan ships nBuckets doubles, model-sized by construction)
      val wLit = typedLit(w.toIndexedSeq)
      // residual r materialized as its own projection so the sigmoid
      // fold runs once per doc, never inside the per-element lambda
      // below (the r2 expensive-expression-in-lambda rule)
      val grad = staged
        .select(col("fs"),
          (lit(1.0) / (lit(1.0) + exp(-(lit(w0) +
            aggregate(col("fs"), lit(0.0),
              (acc, f) => acc + f("x") * element_at(wLit, f("bucket") + 1)))
            )) - col("y")).as("r"))
        // gradient rows for every doc bucket plus pseudo-bucket −1
        // carrying the intercept residual: ONE pass, ONE keyed agg
        .select(explode(concat(
          array(struct(lit(-1).as("bucket"), col("r").as("gx"))),
          transform(col("fs"), f => struct(
            f("bucket").as("bucket"), (f("x") * col("r")).as("gx")))))
          .as("e"))
        .groupBy(col("e.bucket").as("bucket"))
        .agg(sum(col("e.gx")).as("g"))
        .collect() // nBuckets+1-sized: the model, not the corpus
      for (row <- grad) {
        val b = row.getInt(0)
        if (b < 0) w0 -= lr * row.getDouble(1) / nTrain
        else w(b) -= lr * row.getDouble(1) / nTrain
      }
    }
    staged.unpersist()
    (w0, w)
  }

  /** Score documents under a LEARNED `(w0, w)` model (same feature
    * normalization as [[trainQualityLr]]); `score_ppm` is the margin
    * in integer ppm for a stable rows-only output edge. */
  def scoreQualityLr(docs: DataFrame, w0: Double, w: Array[Double],
                     nBuckets: Int = 4096): DataFrame = {
    val wLit = typedLit(w.toIndexedSeq)
    // dot = Σ(m/Σm)·w(b) = (Σ m·w(b)) / Σm — one doc-keyed aggregate,
    // the weight vector riding as an array literal (no totals join, no
    // weight-table broadcast; the gram frame is computed ONCE)
    val scored = hashedGramCounts(docs, nBuckets)
      .groupBy(col("doc_id"))
      .agg((sum(col("m").cast("double") *
          element_at(wLit, col("bucket").cast("int") + 1)) /
        sum(col("m"))).as("dot"))
    docs.select(col("doc_id"), filterKeep(col("text")).as("label_keep"))
      .join(scored, Seq("doc_id"), "left")
      .na.fill(0.0, Seq("dot"))
      .select(col("doc_id"), col("label_keep"),
        round((lit(w0) + col("dot")) * 1e6).cast("long")
          .as("score_ppm"))
      .withColumn("predicted_keep", col("score_ppm") > 0L)
  }

  /**
   * Operating curve of [[nbClassifier]]: confusion counts and exact
   * integer-ppm precision/recall at every decision threshold θ on the
   * floor-bit margin (`bits_drop − bits_keep`; the default verdict is
   * θ = 0, predict keep iff margin > 0) — the sweep a filter owner
   * reads to SET the cutoff instead of inheriting it, trading recall
   * (corpus yield) against precision exactly like
   * `dedup_threshold_sweep` does for Jaccard. One classifier
   * evaluation crossed with a ~9-row broadcast threshold lattice, then
   * a θ-keyed aggregate: O(thresholds) output regardless of corpus
   * size.
   */
  def nbThresholdSweep(docs: DataFrame, trainPct: Int = 50,
                       minCount: Long = 1L,
                       thetas: Seq[Int] = Seq(-16, -12, -8, -4, 0, 4, 8,
                         12, 16)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val th = thetas.map(_.toLong).toDF("theta")
    nbClassifier(docs, trainPct, minCount)
      .select(col("label_keep"),
        (col("bits_drop") - col("bits_keep")).as("margin"))
      .crossJoin(broadcast(th))
      .withColumn("pred", col("margin") > col("theta"))
      .groupBy(col("theta"))
      .agg(
        sum(when(col("pred") && col("label_keep"), 1L).otherwise(0L))
          .as("tp"),
        sum(when(col("pred") && !col("label_keep"), 1L).otherwise(0L))
          .as("fp"),
        sum(when(!col("pred") && col("label_keep"), 1L).otherwise(0L))
          .as("fn"),
        sum(when(!col("pred") && !col("label_keep"), 1L).otherwise(0L))
          .as("tn"))
      .select(col("theta"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          expr("(tp * 1000000) div (tp + fp)")).as("precision_ppm"),
        when(col("tp") + col("fn") > 0,
          expr("(tp * 1000000) div (tp + fn)")).as("recall_ppm"))
      .orderBy(col("theta"))
  }

  /**
   * Filter-ablation report — per quality gate, what it actually
   * removes: for each of the pipeline's four cheap gates (char length
   * 20..100000, mean token length 2..12, stopword ratio > 0.01 — the
   * [[filterKeep]] trio — plus the Gopher word-count gate 10..100000),
   * the documents failing it (`n_fail`) and the documents failing ONLY
   * it (`n_only` — the gate's MARGINAL removal, the number that says
   * whether dropping the gate would change the corpus at all or its
   * losses are already covered by the others). The report a filter
   * owner reads before adding/removing a gate; redundant gates show
   * n_only ≈ 0.
   *
   * Scale shape: one narrow projection computes the four booleans,
   * a constant 4-arm explode tags them, one gate-keyed aggregate —
   * O(gates) output regardless of corpus size, no join, no window.
   */
  def filterAblation(docs: DataFrame): DataFrame = {
    val toks = wordTokens(col("text"))
    val nTok = greatest(size(toks).cast("double"), lit(1.0))
    val gateCols = Seq(
      ("avg_token_len",
        (totalTokenLen(toks).cast("double") / nTok).between(2.0, 12.0)),
      ("len_chars",
        length(coalesce(col("text"), lit(""))).between(20, 100000)),
      ("n_words", size(toks).between(10, 100000)),
      ("stopword_ratio", stopwordCount(toks).cast("double") / nTok > 0.01))
    val flags = docs.select(gateCols.map { case (n, c) =>
      c.as(s"g_$n")
    }: _*)
    val arms = gateCols.map { case (n, _) =>
      struct(lit(n).as("gate"), (!col(s"g_$n")).as("fail"),
        gateCols.collect { case (o, _) if o != n => col(s"g_$o") }
          .reduce(_ && _).as("others_pass"))
    }
    flags.select(explode(array(arms: _*)).as("x"))
      .select(col("x.gate"), col("x.fail"), col("x.others_pass"))
      .groupBy(col("gate"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("fail"), 1L).otherwise(0L)).as("n_fail"),
        sum(when(col("fail") && col("others_pass"), 1L).otherwise(0L))
          .as("n_only"))
      .select(col("gate"), col("n_fail"), col("n_only"),
        expr("(n_fail * 1000000) div n_docs").as("fail_ppm"),
        expr("(n_only * 1000000) div n_docs").as("only_ppm"))
      .orderBy(col("gate"))
  }

  /**
   * Sequence-packing efficiency — padding waste per budget: for each
   * candidate sequence length, the total corpus tokens, the number of
   * fixed-length sequences the [[packSequences]] layout produces
   * (per-shard `ceil(shard_tokens / budget)` — the last sequence of
   * each shard pads), and the padding fraction in exact ppm. The curve
   * a training-layout owner reads to pick the sequence length: longer
   * budgets waste more tail padding per shard, shorter ones truncate
   * more documents across boundaries; this query prices the first half
   * of that trade exactly.
   *
   * Scale shape: ONE corpus pass builds the nShards-row per-shard
   * token totals; the budget lattice rides a broadcast cross of
   * O(budgets) rows. Output O(budgets).
   */
  def packEfficiency(docs: DataFrame,
                     budgets: Seq[Long] = Seq(128L, 256L, 512L, 1024L,
                       2048L),
                     nShards: Int = 8, salt: String = "graft"): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ >= 1L), s"$budgets")
    require(nShards >= 1, s"nShards=$nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    val h = graft.functions.functions.h60(
      concat(col("doc_id").cast("string"), lit(":"), lit(salt)))
    val shardTok = docs
      .select(pmod(h, lit(nShards.toLong)).as("shard"),
        size(tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0)
      .groupBy(col("shard")).agg(sum(col("n")).as("toks"))
    shardTok.crossJoin(broadcast(budgets.toDF("budget")))
      .select(col("budget"), col("toks"),
        expr("(toks + budget - 1) div budget").as("n_seq"))
      .groupBy(col("budget"))
      .agg(sum(col("toks")).as("n_tokens"), sum(col("n_seq")).as("n_seqs"))
      .select(col("budget"), col("n_tokens"), col("n_seqs"),
        expr("((n_seqs * budget - n_tokens) * 1000000) div (n_seqs * budget)")
          .as("padding_ppm"))
      .orderBy(col("budget"))
  }

  /**
   * Calibration (reliability) table of [[nbClassifier]]: the held-out
   * floor-bit margins binned `binWidth` wide, with per-bin doc counts
   * and the TRUE keep-rate in exact ppm — the reliability diagram a
   * filter owner reads to see WHERE the classifier is trustworthy
   * (high-margin bins should approach keep_ppm 10⁶ / 0; bins near 0
   * are the coin-flip zone [[nbThresholdSweep]] trades through).
   * Binning floors through pmod (`(m − pmod(m, w)) div w` — the
   * numerator is exactly divisible, so the engines' differing
   * negative-division conventions never apply). O(bins) output
   * regardless of corpus size; one classifier evaluation, one keyed
   * aggregate.
   */
  def nbCalibration(docs: DataFrame, trainPct: Int = 50,
                    minCount: Long = 1L, binWidth: Long = 4L): DataFrame = {
    require(binWidth >= 1L, s"binWidth=$binWidth")
    nbClassifier(docs, trainPct, minCount)
      .select(col("label_keep"),
        (col("bits_drop") - col("bits_keep")).as("margin"))
      .withColumn("bin",
        expr(s"(margin - pmod(margin, ${binWidth}L)) div ${binWidth}L"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label_keep"), 1L).otherwise(0L)).as("n_keep"))
      .select((col("bin") * lit(binWidth)).as("margin_lo"), col("n_docs"),
        col("n_keep"), expr("(n_keep * 1000000) div n_docs").as("keep_ppm"))
      .orderBy(col("margin_lo"))
  }

  /**
   * The one-query corpus build — the composed flagship of the
   * distillation stages: NB filter over the WHOLE corpus
   * ([[nbScore]] under [[nbTrain]]), per-source T=2 temperature token
   * budgets (√tokens weights, exact ppm rates, capped at 1), then
   * deterministic h60 selection at each source's rate and the shard
   * manifest ([[shardAssign]] with carried manifest columns — one
   * window pass, no self-join). One Catalyst plan: the model and
   * per-source rate joins broadcast, the single-row totals ride
   * broadcast loops, and selection is a pure narrow filter — at
   * 100 TB the only data-sized shuffles are the two classifier
   * aggregates and the shard window. `minCount` is [[nbTrain]]'s
   * broadcast-ability dial: the gated query runs 1 (exact model at
   * the gate SFs); a large-corpus run MUST cap (the ScaleCheck probe
   * runs 2) or the hapax-dominated model table outgrows broadcast.
   */
  def distilledCorpus(docs: DataFrame,
                      tokenBudget: Long = 10000L,
                      minCount: Long = 1L): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget=$tokenBudget")
    val kept = docs.join(
      nbScore(docs, nbTrain(docs, minCount = minCount))
        .filter(col("predicted_keep")).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    // one row per kept doc, referenced by the budget aggregate AND the
    // selection join: checkpoint so the whole NB train+score+semi-join
    // chain above runs once, not once per reference (36 scans in the
    // registered plan without this)
    val kd = kept.select(col("doc_id"), col("source"),
      size(tokens(col("text"))).cast("long").as("n_tok"))
      .localCheckpoint(true)
    val w = kd.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("n_tokens"),
        floor(sqrt(col("n_tokens").cast("double")) * 1048576.0)
          .cast("long").as("w_q20"))
    val tot = w.agg(sum(col("w_q20")).as("w_total"))
    val rate = w.crossJoin(broadcast(tot))
      .select(col("source"),
        when(col("n_tokens") > 0, least(lit(1000000L),
          expr(s"(cast((cast(w_q20 as decimal(38,0)) * ${tokenBudget}L) div w_total as bigint) * 1000000) div n_tokens")))
          .otherwise(lit(0L)).as("rate_ppm"))
    val sel = kd.join(broadcast(rate), Seq("source"))
      .filter(graft.functions.functions.h60(
        concat(col("doc_id").cast("string"), lit(":mix"))) % 1000000L <
        col("rate_ppm"))
    shardAssign(sel.select(col("doc_id"), col("source"),
        col("n_tok").as("n_tokens")), carry = Seq("source", "n_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("shard"), col("pos"))
  }

  // ---- HTML extraction / URL canonicalization ------------------------
  // The two stages UPSTREAM of `cleaned`: a crawl pipeline's documents
  // arrive as (url, html), not (doc_id, text). Both are pure narrow
  // maps (codegen'd regexp/array expressions, zero shuffle — at 100 TB
  // they are scan-bound) and both keep to the Java-regex/RE2-identical
  // subset (inline (?is) flags, lazy quantifiers, no lookaround, no
  // backrefs) so the DuckDB oracle replays them exactly.

  /** `<script ...>...</script>` block, case-insensitive, dot-all.
    * Script and style need SEPARATE passes: without backrefs (RE2 has
    * none) a single alternation could pair `<script>` with
    * `</style>`. The open tag's name is boundary-constrained
    * (`(?:[ \t\n\r/][^>]*)?>` — attributes only after whitespace or
    * `/`): a custom element like `<script-widget>` must NOT open a
    * block, or the lazy body would swallow all page text up to the
    * next genuine `</script>`. */
  val HtmlScriptBlock: String =
    "(?is)<script(?:[ \\t\\n\\r/][^>]*)?>.*?</script[ \\t\\n\\r]*>"
  val HtmlStyleBlock: String =
    "(?is)<style(?:[ \\t\\n\\r/][^>]*)?>.*?</style[ \\t\\n\\r]*>"
  val HtmlComment: String = "(?s)<!--.*?-->"
  /** Any remaining tag. `[^>]` already crosses newlines — no flag. */
  val HtmlTag: String = "<[^>]*>"
  /** An anchor open tag (the boilerplate/link-density signal). */
  val HtmlAnchor: String = "(?i)<a[ \\t\\n\\r>]"

  /**
   * Naive-DOM text extraction — the boilerplate-strip stage a crawl
   * pipeline runs before [[cleaned]]. Contract (fixed order, each step
   * load-bearing): drop script blocks, drop style blocks, drop
   * comments (so commented-out markup never leaks text), replace every
   * remaining tag with a space (block boundaries must not glue words),
   * decode the five entities the encode side emits — `&lt; &gt;
   * &quot; &#39; &nbsp;` first and `&amp;` LAST (decoding `&amp;lt;`
   * must yield the literal text `&lt;`, not `<`) — then collapse
   * whitespace and trim. Title text survives (naive extraction keeps
   * ALL text nodes); script/style/comment interiors do not.
   *
   * Naive-DOM boundaries (by contract, not oversight): CDATA sections
   * and a literal `>` inside a quoted attribute value end the tag
   * early (`<[^>]*>` — a real tokenizer is out of scope for a regex
   * subset both engines replay); numeric entities beyond `&#39;` pass
   * through verbatim.
   */
  /** The six-entity decode the encode side emits — `&lt; &gt; &quot;
    * &#39; &nbsp;` first and `&amp;` LAST (decoding `&amp;lt;` must
    * yield the literal text `&lt;`, not `<`). Shared by
    * [[htmlToText]], [[htmlToLines]] and sitemap `<loc>` decoding —
    * XML escapes the same five. */
  def decodeBasicEntities(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" ")), lit("&amp;"), lit("&"))

  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(
      coalesce(html, lit("")),
      HtmlScriptBlock, ""), HtmlStyleBlock, ""), HtmlComment, "")
    val noTags = regexp_replace(noBlocks, HtmlTag, " ")
    trim(regexp_replace(decodeBasicEntities(noTags), SpaceRun, " "))
  }

  /** Anchor-tag count — with [[htmlToText]] length it gives the
    * link-density boilerplate heuristic. */
  def htmlLinkCount(html: Column): Column =
    size(regexp_extract_all(coalesce(html, lit("")),
      lit(HtmlAnchor), lit(0))).cast("long")

  /** Block-boundary tags (open or close): the tags whose edges a
    * line-oriented extractor renders as newlines, so paragraph
    * structure survives into line-level dedup. */
  val HtmlBlockTag: String =
    "(?i)</?(p|div|br|h[1-6]|li|ul|ol|title|table|tr|td|th)[^>]*>"
  /** Horizontal whitespace only (no \n) — the within-line collapse. */
  val HSpaceRun: String = "[ \\t\\x0B\\f\\r]+"

  /**
   * Line-oriented variant of [[htmlToText]] — the extraction a
   * line-level dedup pipeline actually wants: block-boundary tags
   * ([[HtmlBlockTag]]) become NEWLINES (paragraph structure survives),
   * inline tags become spaces, entities decode in the same order, then
   * horizontal whitespace collapses within lines, blank lines drop,
   * and leading/trailing newlines strip. Feed the result to
   * [[lineDedup]]. Same engine-identical regex subset.
   */
  def htmlToLines(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(
      coalesce(html, lit("")),
      HtmlScriptBlock, ""), HtmlStyleBlock, ""), HtmlComment, "")
    val lined = regexp_replace(
      regexp_replace(noBlocks, HtmlBlockTag, "\n"), HtmlTag, " ")
    val spaced = regexp_replace(
      decodeBasicEntities(lined), HSpaceRun, " ")
    regexp_replace(regexp_replace(regexp_replace(spaced,
      " *\\n *", "\n"), "\\n+", "\n"), "^\\n+|\\n+$", "")
  }

  /**
   * Cross-document LINE-level dedup — the C4/RefinedWeb boilerplate
   * rule (cookie banners, nav footers, subscribe prompts repeat
   * verbatim across a crawl; C4 removed repeated three-sentence spans,
   * RefinedWeb repeated lines). Contract: a line participates in
   * document-frequency counting when its trimmed key is at least
   * `minLineChars` long; a participating key seen in MORE than `maxDf`
   * distinct documents is boilerplate and ALL its occurrences drop
   * (removal is corpus-keyed, not first-wins — cheap and
   * order-independent at 100 TB). Short lines are exempt (separators
   * like `--` would otherwise dedup structure away). Output per doc:
   * kept/dropped counts and the reassembled text (kept lines in
   * original order).
   *
   * Shape at scale: explode → one partial-agged groupBy(key) for the
   * df count (the wire carries distinct keys, not lines) → BROADCAST
   * verdict join against the hot set → groupBy(doc_id) reassembly.
   * Two keyed shuffles plus one broadcast, nothing quadratic; the
   * sort in reassembly is per-doc inside the aggregate (`array_sort`
   * over that doc's lines), never data-sized.
   *
   * Skew discipline (the r11 verdict's one scale question): the hot
   * side is the AGGREGATED boilerplate set (bounded by repeated-line
   * cardinality, not corpus size — keys only enter it past `maxDf`
   * distinct docs; see [[lineDedupHotKeys]], whose cardinality the
   * 100x probe measures), and the verdict join BROADCASTS it, so the
   * line side never partitions on the line key at all: the massive
   * trimmed-empty/`--` keys meet nothing but a hash-table miss, and
   * no plan can serialize a partition on a skewed key. The hint is
   * deliberate — a pathological corpus whose hot set outgrows the
   * broadcast limit must fail LOUDLY (driver OOM) rather than fall
   * back to a sort-merge join that quietly puts every blank line in
   * one partition. Short keys need no routing: every hot key is
   * >= `minLineChars`, so they cannot match. Pinned in
   * PlanAssertionsSpec.
   */
  /** `(doc_id, pos, line, key)` — one row per newline-split line with
    * its trimmed dedup key. Shared by [[lineDedup]] and
    * [[lineDedupHotKeys]]. */
  private[operators] def explodedLines(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), "\n"))
          .as(Seq("pos", "line")))
      .withColumn("key", trim(col("line")))

  /** The hot (boilerplate) key set [[lineDedup]] drops: trimmed keys
    * >= `minLineChars` long seen in more than `maxDf` distinct docs,
    * with their document frequency. Exposed on its own so the scale
    * probes can MEASURE the broadcast side's cardinality — the bound
    * the r11 verdict asked for: this set grows with repeated-line
    * (boilerplate) cardinality, not corpus size, which is why
    * [[lineDedup]] can broadcast it. */
  def lineDedupHotKeys(docs: DataFrame, maxDf: Int = 2,
                       minLineChars: Int = 10): DataFrame =
    explodedLines(docs)
      .filter(length(col("key")) >= minLineChars)
      .groupBy(col("key"))
      .agg(countDistinct(col("doc_id")).as("line_df"))
      .filter(col("line_df") > maxDf)

  def lineDedup(docs: DataFrame, maxDf: Int = 2,
                minLineChars: Int = 10): DataFrame = {
    // ONE evaluation of the exploded lines: the hot-key aggregate and
    // the routing join both consume them, and `docs` is typically the
    // expensive end of a pipeline (decode + extract in the frontier
    // flagship) — without the checkpoint that whole upstream chain
    // runs twice. The materialized frame is line-sized (text payload);
    // localCheckpoint storage is MEMORY_AND_DISK, so at corpus scale
    // this trades one disk-backed write for a full second pass of the
    // upstream chain.
    val lines = explodedLines(docs).localCheckpoint(true)
    val hot = lines
      .filter(length(col("key")) >= minLineChars)
      .groupBy(col("key"))
      .agg(countDistinct(col("doc_id")).as("line_df"))
      .filter(col("line_df") > maxDf)
      .select(col("key"), lit(true).as("__hot"))
    // short lines cannot match (every hot key is >= minLineChars), so
    // one broadcast left join IS the routing: the line side never
    // repartitions on the line key, and the skewed blank-line key
    // meets nothing but a hash-table miss
    lines.join(broadcast(hot), Seq("key"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("__hot").isNull, 1L).otherwise(0L))
          .as("n_lines_kept"),
        sum(when(col("__hot").isNotNull, 1L).otherwise(0L))
          .as("n_lines_dropped"),
        array_join(transform(
          // collect_list skips the nulls the `when` leaves for
          // dropped lines; struct sort orders by pos first
          array_sort(collect_list(when(col("__hot").isNull,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"))
  }

  /**
   * C4-STYLE line-level quality rule (after Raffel et al. 2020 §2.2,
   * with deliberate deviations — r13 ADVICE; distinct from the
   * corpus-keyed [[lineDedup]] and the doc-level [[qualityScore]]):
   * a line KEEPS iff, trimmed, it ends in a terminal punctuation
   * mark (`.` `!` `?` or a closing double quote), carries at least
   * `minWords` word tokens, and does not mention "javascript"
   * (case-insensitive) — the menu/boilerplate screen that runs
   * BEFORE cross-doc dedup, purely doc-local. Deviations from the
   * paper, stated: the default `minWords = 5` is STRICTER than the
   * paper's 3-word line floor; "words" here are [[wordTokens]]
   * (alphabetic `[a-z]+` runs), so numbers and punctuated tokens
   * don't count toward the floor; and the paper's page-level
   * 5-sentence floor is not this operator's job (compose it from
   * `n_lines_kept` downstream, as pipeline_quality_gate does).
   * Page-level flags ride along: `has_curly` (the `{` code smell)
   * and `has_lorem` ("lorem ipsum") mark docs the C4 recipe drops
   * whole — emitted as flags, the caller decides (flag-don't-drop).
   * Per doc: kept/dropped counts, both flags, and the reassembled
   * `clean_text` in line order. Pure string column math — one
   * explode + one keyed aggregate, zero joins, scan-bound; fully
   * oracle-replayable.
   */
  def lineQuality(docs: DataFrame, minWords: Int = 5): DataFrame = {
    val lines = explodedLines(docs)
    // \z (end of TEXT in both engines), not $ — the repo-wide anchor
    // convention (Java $ tolerates a trailing newline, RE2 $ does not)
    val keep = col("key").rlike("[.!?\"]\\z") &&
      (size(wordTokens(col("line"))) >= minWords) &&
      !lower(col("line")).contains("javascript")
    lines
      .withColumn("__keep", keep)
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_lines_kept"),
        sum(when(!col("__keep"), 1L).otherwise(0L)).as("n_lines_dropped"),
        bool_or(col("line").contains("{")).as("has_curly"),
        bool_or(lower(col("line")).contains("lorem ipsum")).as("has_lorem"),
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"))
  }

  /** `<title>` body (dot-all for multi-line titles). */
  val HtmlTitleBody: String = "(?is)<title[^>]*>(.*?)</title"
  // Meta/link attribute extraction is TWO-STEP: (1) grab the whole
  // tag whose marker attribute (name=robots / rel=canonical) appears
  // in ANY position and ANY quoting style (double, single, none) —
  // the marker must follow whitespace so `data-name=robots` never
  // matches, and an unquoted value must end at whitespace, `/` or
  // `>`; (2) pull the value attribute out of that one tag, coalescing
  // double-quoted / single-quoted / unquoted alternates. A robots
  // meta the wild writes as `<meta name=robots content=noindex>` must
  // NOT silently fail OPEN as indexable (r11 advisory). No
  // lookaround, no backrefs — the RE2/Java-identical subset.
  val HtmlMetaRobotsTag: String =
    "(?is)<meta[ \\t\\n\\r](?:[^>]*[ \\t\\n\\r])?name=[\"']?robots[\"']?" +
      "(?:[ \\t\\n\\r/][^>]*)?>"
  val HtmlCanonicalTag: String =
    "(?is)<link[ \\t\\n\\r](?:[^>]*[ \\t\\n\\r])?rel=[\"']?canonical[\"']?" +
      "(?:[ \\t\\n\\r/][^>]*)?>"
  /** `content=` value inside an already-extracted tag, one pattern
    * per quoting style (coalesced dq → sq → unquoted). The leading
    * boundary class (whitespace or a closing quote) keeps a
    * `data-content=` attribute from feeding the value — the attribute
    * NAME needs a left edge just like the tag markers do. */
  val AttrContentDq: String = "(?is)[ \\t\\n\\r\"']content=\"([^\"]*)\""
  val AttrContentSq: String = "(?is)[ \\t\\n\\r\"']content='([^']*)'"
  val AttrContentUq: String =
    "(?is)[ \\t\\n\\r\"']content=([^\"'> \\t\\n\\r][^> \\t\\n\\r]*)"
  val AttrHrefDq: String = "(?is)[ \\t\\n\\r\"']href=\"([^\"]*)\""
  val AttrHrefSq: String = "(?is)[ \\t\\n\\r\"']href='([^']*)'"
  val AttrHrefUq: String =
    "(?is)[ \\t\\n\\r\"']href=([^\"'> \\t\\n\\r][^> \\t\\n\\r]*)"

  /** Page title text, whitespace-collapsed and trimmed ("" if none). */
  def htmlTitle(html: Column): Column =
    trim(regexp_replace(regexp_extract(coalesce(html, lit("")),
      HtmlTitleBody, 1), SpaceRun, " "))

  /** `<meta name=robots>` directives, lowercased ("" if none) — the
    * compliance signal a crawl pipeline must honor. FIRST robots meta
    * on the page wins; any quoting style and attribute order. */
  def htmlMetaRobots(html: Column): Column = {
    val tag = regexp_extract(coalesce(html, lit("")), HtmlMetaRobotsTag, 0)
    lower(trim(coalesce(
      nullif(regexp_extract(tag, AttrContentDq, 1), lit("")),
      nullif(regexp_extract(tag, AttrContentSq, 1), lit("")),
      regexp_extract(tag, AttrContentUq, 1))))
  }

  /** `rel=canonical` href ("" if none). Real pipelines dedup on
    * THIS (canonicalized) when present — the publisher's declared
    * identity beats the fetched URL. First canonical link wins; any
    * quoting style and attribute order. */
  def htmlCanonicalHref(html: Column): Column = {
    val tag = regexp_extract(coalesce(html, lit("")), HtmlCanonicalTag, 0)
    trim(coalesce(
      nullif(regexp_extract(tag, AttrHrefDq, 1), lit("")),
      nullif(regexp_extract(tag, AttrHrefSq, 1), lit("")),
      regexp_extract(tag, AttrHrefUq, 1)))
  }

  /**
   * The CANONICAL IDENTITY key a crawl dedup actually groups on: the
   * publisher's declared `rel=canonical` target when the page carries
   * one (the declared identity beats the fetched URL — print pages,
   * mirrors, session-tracked variants all point at one target), else
   * the fetched URL; either way normalized through [[urlCanonical]]
   * (a declared href is as messy as any URL in the wild). Pure
   * single-row expression work — the one downstream groupBy is the
   * only shuffle.
   */
  def canonicalIdentity(url: Column, html: Column): Column =
    urlCanonical(coalesce(
      nullif(htmlCanonicalHref(html), lit("")), coalesce(url, lit(""))))

  /** Query params stripped during canonicalization: tracking noise
    * that splits otherwise-identical URLs into distinct keys. Matches
    * the whole param (`name` or `name=...`). Anchored with `\z`
    * (end-of-TEXT in both Java regex and RE2) rather than `$`, which
    * the two engines disagree on before a trailing newline — a
    * newline-bearing param must NOT silently count as tracking noise
    * in one engine and survive in the other. Same discipline in every
    * [[urlCanonical]] pattern below. */
  val UrlTrackingParam: String = "^(utm_[^=]*|fbclid|gclid|ref)(=(?s:.*))?\\z"

  /** Shared URL component extraction — ONE copy of the scheme /
    * authority / default-port / fragment / trailing-slash / query
    * regexes consumed by [[urlCanonical]] and
    * [[Archive.surtKey]] (and replayed by the `UrlCanonCte` oracle
    * body): a fix here moves every consumer together, so CDX urlkeys
    * can never drift from the canonical-url dedup keys. */
  private[operators] final case class UrlParts(
    scheme: Column, authority: Column, host: Column, path: Column,
    query: Column)

  private[operators] def urlParts(url: Column): UrlParts = {
    val u = coalesce(url, lit(""))
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val noFrag = regexp_replace(
      regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", ""), "(?s)#.*\\z", "")
    val authority = lower(regexp_extract(noFrag, "^([^/?]*)", 1))
    val host = when(scheme === "http",
        regexp_replace(authority, ":80\\z", ""))
      .when(scheme === "https", regexp_replace(authority, ":443\\z", ""))
      .otherwise(authority)
    val rest = regexp_replace(noFrag, "^[^/?]*", "")
    val path = regexp_replace(
      regexp_replace(rest, "(?s)\\?.*\\z", ""), "/+\\z", "")
    val query = regexp_extract(rest, "(?s)\\?(.*)\\z", 1)
    UrlParts(scheme, authority, host, path, query)
  }

  /** Non-empty query params, tracking class removed, byte-sorted —
    * the shared param discipline of the canonical/surt keys. */
  private[operators] def sortedParams(query: Column): Column =
    array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(UrlTrackingParam)))


  /**
   * URL canonicalization for crawl-level dedup. Contract (absolute
   * http/https URLs): lowercase scheme and host (path/query case is
   * significant and preserved), drop the fragment, drop the default
   * port (`:80` for http, `:443` for https — non-default ports stay),
   * drop tracking params ([[UrlTrackingParam]]), byte-sort the
   * surviving params (param order is transport noise), drop trailing
   * `/` runs from the path (so `/a/` ≡ `/a` and `/` ≡ empty), omit
   * `?` when no params survive. Pure single-row expression work —
   * the exact-dedup groupBy downstream is the only shuffle.
   *
   * Contract boundaries: percent-encoding is preserved VERBATIM
   * (`%7E` and `~` are distinct keys by design — decoding is a
   * normalization policy, not a syntax fact), userinfo/IPv6
   * authorities pass through as part of the lowercased host, and
   * scheme-relative or relative references are out of contract
   * (callers resolve against a base first).
   */
  def urlCanonical(url: Column): Column = {
    val p = urlParts(url)
    val params = sortedParams(p.query)
    concat(p.scheme, lit("://"), p.host, p.path,
      when(size(params) > 0,
        concat(lit("?"), array_join(params, "&"))).otherwise(lit("")))
  }

  /**
   * Confusion rollup of [[nbClassifier]] vs its own training heuristic
   * on the held-out half — the number a filter owner reads before
   * swapping the heuristic for the model (agreement rate, and WHICH
   * way the disagreements lean). One tiny 4-row aggregate over the
   * classifier output plus a broadcast total; `share_ppm` is exact
   * integer ppm of held-out docs.
   */
  def nbAgreement(docs: DataFrame, trainPct: Int = 50,
                  minCount: Long = 1L): DataFrame = {
    // the held-out total folds from the ≤4-row confusion table itself
    // (an unpartitioned window over ≤4 rows — NOT data-sized), so the
    // full classifier DAG evaluates exactly once; a separate
    // nb.agg(count) branch would re-run corpus tokenization, the train
    // explode, and the score join a second time
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy()
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    nbClassifier(docs, trainPct, minCount)
      .groupBy(col("label_keep"), col("predicted_keep"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_eval", sum(col("n_docs")).over(w))
      .select(col("label_keep"), col("predicted_keep"), col("n_docs"),
        expr("(n_docs * 1000000) div n_eval").as("share_ppm"))
      .orderBy(col("label_keep"), col("predicted_keep"))
  }
}

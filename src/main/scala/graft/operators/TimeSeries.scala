package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series operators over the event stream (`user_id, ts, value`) —
 * per-series anomaly flagging and motif discovery, the monitoring
 * layer a CDC consumer runs on the extracted metrics.
 *
 * Both are engineered for exact cross-engine verification: the z-score
 * test is cleared of division and sqrt entirely (compare
 * (x·n−S)²·d² > (n·Q−S²)·z² in integers — same trick as
 * [[Similarity.centroidOutliers]]), and SAX discretization uses only
 * ranks (`ntile`), which are positional, never numeric.
 */
object TimeSeries {

  /**
   * Per-user z-score outliers: events whose value sits more than
   * `zNumer/zDenom` population standard deviations from the user's
   * mean. Values are quantized to the 2⁻²⁰ lattice (exact power-of-two
   * float scaling), per-user (S, Q=Σq², n) is one aggregate, and the
   * flag is the integer comparison
   * `(q·n − S)²·zDenom² > (n·Q − S²)·zNumer²` — no mean, no variance,
   * no division ever materializes, so the DuckDB oracle reproduces it
   * in HUGEINT bit-for-bit. Every square is formed IN decimal (q is
   * cast to DECIMAL(19,0) before multiplying — a Long×Long square
   * would silently wrap past |q| ≈ 3·10⁹, i.e. |value| ≈ 2896);
   * envelope: values ≤ ~10²⁶ for |value| ≤ 10⁴, n ≤ 10⁶ per user,
   * comfortably inside DECIMAL(38,0).
   *
   * Scale shape: one user-keyed aggregate, one user-keyed join back —
   * both balanced; the event side never sorts.
   */
  def zscoreAnomalies(log: DataFrame, zNumer: Int = 3,
                      zDenom: Int = 2): DataFrame = {
    val ev = log.select(col("user_id"), col("event_id"),
      floor(col("value") * 1048576.0).cast("long").as("q"))
    val qDec = col("q").cast("decimal(19,0)")
    val agg = ev.groupBy(col("user_id")).agg(
      sum(col("q")).as("s"),
      sum(qDec * qDec).as("qq"),
      count(lit(1)).as("n"))
    val dev = (col("q") * col("n") - col("s")).cast("decimal(19,0)")
    val sBig = col("s").cast("decimal(19,0)")
    ev.join(agg, "user_id")
      .filter(dev * dev * lit(zDenom * zDenom) >
        (col("qq") * col("n") - sBig * sBig) * lit(zNumer * zNumer))
      .select(col("user_id"), col("event_id"), col("q").as("value_q20"),
        col("n").as("n_events"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /**
   * SAX motif discovery: each user's first `nDays` active days are
   * discretized into `buckets` rank quartiles of the daily value sum
   * (ntile over the user's own days — positional, engine-exact), the
   * day-ordered bucket digits form the user's SAX word, and users
   * sharing a word share a behavior motif. Output: word → user count.
   *
   * Scale shape: the daily rollup is the only data-sized aggregate;
   * every window partitions by user (thousands of tiny partitions,
   * never a global sort); words are ≤ nDays chars.
   */
  def saxMotifs(log: DataFrame, nDays: Int = 8,
                buckets: Int = 4): DataFrame =
    saxWords(log, nDays, buckets)
      .groupBy(col("word")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("word"))

  /** Per-user SAX word over the first `nDays` active days (complete
    * words only) — the shared discretization behind [[saxMotifs]] and
    * [[seriesKnn]]. Rank-quartile buckets (ntile over the user's own
    * days) are positional, so both engines agree exactly. */
  def saxWords(log: DataFrame, nDays: Int = 8,
               buckets: Int = 4): DataFrame = {
    val daily = log.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("dsum"))
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val first = daily
      .select(col("user_id"), col("day"), col("dsum"),
        row_number().over(byDay).as("dn"))
      .filter(col("dn") <= nDays)
    val byVal = Window.partitionBy(col("user_id"))
      .orderBy(col("dsum"), col("day"))
    val bucketed = first.select(col("user_id"), col("day"),
      ntile(buckets).over(byVal).as("b"))
    bucketed.groupBy(col("user_id"))
      .agg(concat_ws("", transform(
          sort_array(collect_list(struct(col("day"), col("b")))),
          s => s.getField("b").cast("string"))).as("word"),
        count(lit(1)).as("n_days"))
      .filter(col("n_days") === nDays) // complete words only
      .select(col("user_id"), col("word"))
  }

  /**
   * Distributed time-series similarity SEARCH (the EDBT'19 streaming
   * TS-similarity theme re-expressed Spark-first): for each query
   * user, the `k` most behavior-similar other users. Series are
   * compared in SAX space — [[saxWords]]' rank-quartile words — with
   * the exact integer symbol distance Σ(aᵢ−bᵢ)², so the whole search
   * rides the engine-exact lattice (no float, no z-normalization
   * divergence between engines).
   *
   * Scale shape: candidate generation is BANDED, never all-pairs —
   * each word splits into `segments` positional segments and only
   * users sharing a segment at the same position meet (the
   * pigeonhole: any pair within total distance 0 on some segment
   * collides; distant pairs rarely do). The segment join is
   * query-side-filtered first, candidate pairs dedup on (query,
   * neighbor), and the final top-k is [[graft.functions.TopKByScore]]
   * — map-side partial, so at most k candidates per query cross the
   * shuffle regardless of corpus size. Hot segments (flat-profile
   * users) are AQE-skew territory, same as the LSH band joins.
   */
  def seriesKnn(log: DataFrame, queryPred: Column, k: Int = 5,
                nDays: Int = 8, buckets: Int = 4,
                segments: Int = 2): DataFrame = {
    require(nDays % segments == 0, s"nDays=$nDays segments=$segments")
    // one CHARACTER per SAX symbol: segment substrings and the
    // per-position distance both index by char, so a multi-digit
    // ntile symbol (buckets >= 10) would silently compute wrong
    // segments/distances instead of failing (r8 advisory)
    require(buckets >= 2 && buckets <= 9, s"buckets=$buckets")
    val segLen = nDays / segments
    val words = saxWords(log, nDays, buckets)
    val segs = words
      .select(col("user_id"), col("word"),
        explode(sequence(lit(0), lit(segments - 1))).as("g"))
      .select(col("user_id"), col("word"), col("g"),
        expr(s"substring(word, g * $segLen + 1, $segLen)").as("seg"))
    val sq = (a: String, b: String) =>
      s"(CAST(substring($a, i, 1) AS INT) - CAST(substring($b, i, 1) AS INT))"
    val cand = segs.filter(queryPred).alias("q")
      .join(segs.alias("c"),
        col("q.g") === col("c.g") && col("q.seg") === col("c.seg") &&
          col("q.user_id") =!= col("c.user_id"))
      .select(col("q.user_id").as("query_user"), col("q.word").as("qw"),
        col("c.user_id").as("neighbor"), col("c.word").as("cw"))
      .distinct() // a pair may collide on several segments
      .withColumn("dist", expr(
        s"CAST(aggregate(transform(sequence(1, $nDays), " +
          s"i -> ${sq("qw", "cw")} * ${sq("qw", "cw")}), " +
          "0, (acc, x) -> acc + x) AS BIGINT)"))
    cand.groupBy(col("query_user"))
      .agg(graft.functions.TopKByScore.top_k(
        -col("dist").cast("double"), col("neighbor"),
        col("dist").cast("double"), k).as("top"))
      .select(col("query_user"), posexplode(col("top")))
      .select(col("query_user"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor"), col("col.sim").cast("long").as("dist"))
      .orderBy(col("query_user"), col("rank"))
  }

  /**
   * Per-user MAD (median-absolute-deviation) outliers — the robust
   * twin of [[zscoreAnomalies]]: a single wild value inflates a
   * z-score's variance and can mask itself; the median/MAD pair is
   * breakdown-50% robust. Flags events with
   * `|x − median| > (kNumer/kDenom) · MAD`.
   *
   * Exactness: medians of even-sized sets land on half-integers, so
   * everything rides DOUBLED lattices — `med2 = q_lo + q_hi` (the two
   * middle order statistics summed ≡ 2·median, an integer always) and
   * `mad4 ≡ 4·MAD` likewise from the doubled deviations
   * `D = |2q − med2|`; the flag is the pure-integer comparison
   * `2·D·kDenom > kNumer·mad4`. No division, no float — the oracle
   * replays it bit-for-bit. Envelope: |q| ≤ 2³¹ ⇒ every term ≤ 2³⁶,
   * far inside Long.
   *
   * Scale shape: two per-user rank windows (value order, then
   * deviation order — partitioned by user like [[saxMotifs]]'s, never
   * global) and two user-keyed aggregate/join-back rounds.
   */
  /**
   * Per-user lag-k autocorrelation in exact integer arithmetic — the
   * "is this series self-similar at lag k" diagnostic (rate metrics
   * with strong lag-1 ACF need level-change alerts, white-noise-like
   * series need threshold alerts). For the user's event sequence in
   * (ts, event_id) order, reports
   *
   *   acf_ppm = 10⁶ · Σ(n·xₜ−S)(n·xₜ₊ₖ−S) / Σ'(n·xₜ−S)²
   *
   * — the mean-centered lag product with every term multiplied
   * through by n² so no mean or fraction ever materializes (the
   * [[zscoreAnomalies]] clearing trick applied to covariance). The
   * denominator Σ' runs over the same n−k leading terms as the
   * numerator (the "jackknife" ACF form), keeping both sums over
   * identical index sets so the ratio is a true cosine in [−10⁶,10⁶].
   * Products ride DECIMAL(38,0) (n·x−S can reach ~2⁴⁵ at the 2⁻²⁰
   * lattice; its square ~2⁹⁰ — far past Long), and the final ratio is
   * one integer `div`, bit-equal in DuckDB HUGEINT.
   *
   * Scale shape: one per-user `lead` window (partitioned — thousands
   * of tiny user partitions, never global), one user-keyed aggregate
   * for (S, n), one for the lag sums. Nothing data-sized sorts
   * globally.
   */
  def autocorrLag(log: DataFrame, lag: Int = 1): DataFrame = {
    require(lag >= 1, s"lag=$lag")
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = log.select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 1048576.0).cast("long").as("q"))
      .withColumn("q_lead", lead(col("q"), lag).over(byTs))
    val stats = ev.groupBy(col("user_id")).agg(
      sum(col("q")).as("s"), count(lit(1)).as("n"))
    val dev = (col("q") * col("n") - col("s")).cast("decimal(38,0)")
    val devLead = (col("q_lead") * col("n") - col("s")).cast("decimal(38,0)")
    ev.join(stats, "user_id")
      .filter(col("q_lead").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(dev * devLead).as("num"),
        sum(dev * dev).as("den"),
        count(lit(1)).as("n_terms"))
      .filter(col("den") > 0)
      // sign split before the div: truncating vs flooring integer
      // division disagree on negatives across engines — dividing the
      // absolute value and re-applying the sign is engine-neutral
      .select(col("user_id"), col("n_terms"),
        (signum(col("num")).cast("long") *
          expr("(abs(num) * 1000000) div den").cast("long")).as("acf_ppm"))
      .orderBy(col("user_id"))
  }

  /**
   * Sliding two-sample level-shift detection — per-user changepoint
   * candidates: positions where the mean of the `w` values BEFORE
   * differs from the mean of the `w` values AT-AND-AFTER by more than
   * `kNumer/kDenom` lattice units. The comparison is cross-multiplied
   * (`|S_after·n_before − S_before·n_after| · kDenom >
   *   kNumer · n_before · n_after`) so no mean is ever divided —
   * both windows' sums and counts come from ONE pass of two per-user
   * frame windows (rows between), and the flag replays exactly in the
   * oracle's window SQL. Only full windows fire (n_before = n_after =
   * w): a truncated boundary window would compare unlike sample sizes
   * at inflated variance — the standard guard.
   *
   * Scale shape: two frame windows and a filter, all partitioned by
   * user — the per-user frames are the ONLY state; no join, no
   * global sort. At 100 TB this is one shuffle on user_id.
   */
  def levelShifts(log: DataFrame, w: Int = 4, kNumer: Long = 3L,
                  kDenom: Long = 2L): DataFrame = {
    require(w >= 2, s"w=$w")
    require(kNumer > 0 && kDenom > 0, s"k=$kNumer/$kDenom")
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val before = byTs.rowsBetween(-w, -1)
    val after = byTs.rowsBetween(0, w - 1)
    val ev = log.select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 1048576.0).cast("long").as("q"))
      .withColumn("s_b", sum(col("q")).over(before))
      .withColumn("n_b", count(lit(1)).over(before))
      .withColumn("s_a", sum(col("q")).over(after))
      .withColumn("n_a", count(lit(1)).over(after))
      .filter(col("n_b") === w && col("n_a") === w)
    // shift2 = |S_a·n_b − S_b·n_a|: 2w·w·|Δmean| on the q lattice;
    // decimal guards the product envelope (|S| ≤ w·2⁴⁵ at w ≤ 10³)
    val shift = abs(col("s_a").cast("decimal(38,0)") * col("n_b") -
      col("s_b").cast("decimal(38,0)") * col("n_a"))
    ev.filter(shift * lit(kDenom) >
        lit(kNumer) * col("n_b").cast("decimal(38,0)") * col("n_a"))
      .select(col("user_id"), col("event_id"),
        col("s_b").as("sum_before"), col("s_a").as("sum_after"))
      .orderBy(col("user_id"), col("event_id"))
  }

  def madOutliers(log: DataFrame, kNumer: Int = 3,
                  kDenom: Int = 1): DataFrame = {
    require(kNumer > 0 && kDenom > 0, s"k=$kNumer/$kDenom")
    val ev = log.select(col("user_id"), col("event_id"),
      floor(col("value") * 1048576.0).cast("long").as("q"))
    val n = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    // weight 2 when both middle ranks coincide (odd n), else 1 each
    val lo = expr("(n + 1) div 2")
    val hi = expr("(n + 2) div 2")
    val byQ = Window.partitionBy(col("user_id")).orderBy(col("q"))
    val med2 = ev.join(n, "user_id")
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") === lo || col("rn") === hi)
      .groupBy(col("user_id"))
      .agg(sum(col("q") * (lit(2) - (hi - lo))).as("med2"))
    val devs = ev.join(med2, "user_id")
      .withColumn("d", abs(col("q") * 2 - col("med2")))
    val byD = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val mad4 = devs.join(n, "user_id")
      .withColumn("rn", row_number().over(byD))
      .filter(col("rn") === lo || col("rn") === hi)
      .groupBy(col("user_id"))
      .agg(sum(col("d") * (lit(2) - (hi - lo))).as("mad4"))
    devs.join(mad4, "user_id")
      .filter(col("d") * 2 * kDenom > col("mad4") * kNumer)
      .select(col("user_id"), col("event_id"), col("d").as("dev2"),
        col("mad4"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /**
   * Per-series OLS trend slope, exact: x = event-time minutes,
   * y = the 2⁻²⁰-lattice value. The closed form
   * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` is kept as an exact
   * integer (numerator, denominator) pair in DECIMAL(38,0) — no mean
   * is ever divided — plus the ppm ratio via sign-split integer
   * division (truncating vs flooring division disagree on negatives
   * across engines; dividing |num| and re-applying the sign is
   * engine-neutral, same discipline as [[autocorrLag]]).
   *
   * Envelope: minutes ~3·10⁷, q ≤ ~10⁹, n ≤ 10⁶ per user →
   * n·Σxy ≤ ~10²⁸, inside DECIMAL(38,0) ≙ DuckDB HUGEINT.
   *
   * Scale shape: ONE user-keyed aggregate (all five moments partial/
   * map-side combinable), no join, no window, no sort of the events.
   */
  /**
   * Time-grid regularization with last-observation-carried-forward —
   * the resampling step between an irregular event stream and
   * anything that wants fixed-step series (models, dashboards,
   * windowed feature builders): for every series key and every grid
   * instant `startUs + i·stepUs`, the latest observation at-or-before
   * that instant (2⁻²⁰-lattice value), its source event id, and the
   * staleness `grid − observation` — null before the first
   * observation, and the staleness column is what a consumer
   * thresholds to refuse values carried too far (the market-data
   * rule; cf. [[AsofJoin.asofJoinWithin]]).
   *
   * Same-instant duplicate observations collapse to the highest
   * event id before the join, so the carried value is deterministic
   * on both engines.
   *
   * Scale shape: the grid is keys × points (explode of a bounded
   * sequence — linear, no data-sized generation), observations
   * reduce through one keyed (user, instant) aggregate, and the LOCF
   * itself is [[AsofJoin.asofJoin]]'s union + running-last window:
   * one exchange per side, never a per-key quadratic probe.
   */
  def gapFillLocf(log: DataFrame, startUs: Long, points: Int,
                  stepUs: Long): DataFrame = {
    require(points >= 1 && points <= 1000000, s"points=$points")
    require(stepUs > 0, s"stepUs=$stepUs")
    val grid = log.select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(sequence(lit(0L), lit(points - 1L))).as("i"))
      .select(col("user_id"), (lit(startUs) + col("i") * stepUs).as("ts_us"))
    val obs = log.select(col("user_id"),
        graft.util.Cols.epochUs(col("ts")).as("ts_us"),
        floor(col("value") * 1048576.0).cast("long").as("q"),
        col("event_id"))
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max_by(struct(col("event_id"), col("q")), col("event_id")).as("v"))
      .select(col("user_id"), col("ts_us"), col("v.q").as("q"),
        col("v.event_id").as("src_event_id"))
    AsofJoin.asofJoin(grid, obs, "user_id", "ts_us")
      .select(col("user_id"), col("ts_us"),
        col("asof.q").as("value_q20"),
        col("asof.src_event_id").as("src_event_id"),
        (col("ts_us") - col("asof.ts_us")).as("staleness_us"))
      .orderBy(col("user_id"), col("ts_us"))
  }

  /**
   * CUSUM changepoint per event type over the per-minute arrival-count
   * series — "when did this stream's behavior change": the minute
   * maximizing the cleared-denominator cumulative deviation
   *
   *   S_k = n·(Σ_{i≤k} c_i) − k·(Σ c_i)   ( = n·Σ_{i≤k}(c_i − mean) )
   *
   * i.e. classic CUSUM against the series' own mean with the division
   * multiplied away — pure integer arithmetic, so both engines agree
   * bit-for-bit (same clearing trick as [[trendSlope]]'s num/den).
   * |S| peaks where the cumulative arrivals deviate furthest from the
   * constant-rate line: a rate step-change pins the peak at the step.
   * Ties break to the earliest minute. Minutes with zero arrivals are
   * not points of the series (the count rollup has no row to emit) —
   * the statistic is over OBSERVED minutes, documented contract.
   *
   * Envelope: n·tot < 2⁶³ — holds to ~10⁶ observed minutes (two years
   * at minute grain) × ~10¹² events; beyond that, lift the two
   * products to DECIMAL(38,0).
   *
   * Scale shape: the only data-sized stage is the (type, minute)
   * count rollup — keyed, map-side combinable. The windows run over
   * the ROLLED-UP series (rows = observed minutes per type:
   * time-range-sized metadata, ~5·10⁵/year), partitioned by type; the
   * raw events are never sorted. Final output: one row per type.
   */
  def cusumChangepoints(log: DataFrame): DataFrame = {
    val perMin = log
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("mn"))
      .agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy(col("event_type"))
    val ordered = byType.orderBy(col("mn"))
    val prefixed = perMin.select(col("event_type"), col("mn"), col("c"),
      count(lit(1)).over(byType).as("n"),
      sum(col("c")).over(byType).as("tot"),
      sum(col("c")).over(ordered.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("pre"),
      row_number().over(ordered).cast("long").as("k"))
    val scored = prefixed.select(col("event_type"), col("mn"), col("n"),
        col("tot"),
        abs(col("n") * col("pre") - col("k") * col("tot")).as("s_abs"))
      .withColumn("rn", row_number().over(
        byType.orderBy(col("s_abs").desc, col("mn"))))
    scored.filter(col("rn") === 1)
      .select(col("event_type"),
        graft.util.Cols.epochUs(col("mn")).as("cp_minute_us"),
        col("s_abs"), col("n").as("n_minutes"), col("tot").as("total_events"))
      .orderBy(col("event_type"))
  }

  /**
   * Per-user EWMA smoothing (half-life = one observation) on the 2⁻²⁰
   * value lattice, truncated at `lags` terms: the smoothed value at
   * row i is Σₖ 2^(lags-1-k)·q_{i-k} over the k ∈ [0, lags) rows that
   * exist, divided (truncating integer division — identical semantics
   * in Spark `div` and DuckDB `//`) by the sum of the weights that
   * were actually available, so the head of each series is an exact
   * partial-window EWMA rather than a NULL run or a zero-padded bias.
   * The truncated tail it drops carries weight < 2^-lags of the
   * total — below the q20 lattice resolution for lags ≥ 8.
   *
   * Everything is integer: q ≤ 2²⁰·|value|, times weight ≤ 2⁷, times
   * 8 terms ⇒ |num| ≤ 2³⁰·|value| — far inside Long for any sane
   * metric range. Deterministic ordering is (ts, event_id).
   *
   * Scale shape: one user-partitioned window (thousands of small
   * partitions, no global sort); the `lags` lag() calls share the
   * single window sort — one shuffle, one sort, lags-row lookback
   * buffer per partition.
   */
  def ewmaSmooth(log: DataFrame, lags: Int = 8): DataFrame = {
    require(lags >= 1 && lags <= 62, s"lags=$lags")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = log.select(col("user_id"), col("event_id"), col("ts"),
      floor(col("value") * 1048576.0).cast("long").as("q"))
    val terms = (0 until lags).map { k =>
      val weight = 1L << (lags - 1 - k)
      val l = if (k == 0) col("q") else lag(col("q"), k).over(w)
      (coalesce(l * weight, lit(0L)),
        when(l.isNotNull, lit(weight)).otherwise(lit(0L)),
        when(l.isNotNull, lit(1L)).otherwise(lit(0L)))
    }
    ev.withColumn("num", terms.map(_._1).reduce(_ + _))
      .withColumn("den", terms.map(_._2).reduce(_ + _))
      .withColumn("n_lags", terms.map(_._3).reduce(_ + _))
      .select(col("user_id"), col("event_id"), col("q").as("value_q20"),
        expr("num div den").as("ewma_q20"), col("n_lags"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /**
   * Seasonal load profile: events bucketed by (day-of-week,
   * hour-of-day) with count, lattice value sum, milli-resolution
   * truncated mean, and each cell's traffic share in ppm. Day-of-week
   * is computed arithmetically from epoch microseconds
   * (`(days + 4) % 7`, 0 = Sunday — 1970-01-01 was a Thursday) rather
   * than via engine date functions, whose week-start conventions
   * differ between Spark and DuckDB.
   *
   * Scale shape: one keyed aggregate to at most 168 cells; the grand
   * total joins back as a broadcast single row (no global window).
   */
  def seasonalProfile(log: DataFrame): DataFrame = {
    val cells = log.select(graft.util.Cols.epochUs(col("ts")).as("us"),
        floor(col("value") * 1048576.0).cast("long").as("q"))
      .select(expr("((us div 86400000000) + 4) % 7").as("dow"),
        expr("(us div 3600000000) % 24").as("hr"), col("q"))
      .groupBy(col("dow"), col("hr"))
      .agg(count(lit(1)).as("n"),
        // decimal sum: a cell aggregates corpus/168 events, so a Long
        // sum would wrap inside the anomaly op's documented envelope
        sum(col("q").cast("decimal(19,0)")).cast("decimal(38,0)")
          .as("sum_q20"))
    val total = log.select(count(lit(1)).as("n_total"))
    cells.crossJoin(broadcast(total))
      // sum_q20 leaves as BIGINT (decimal stays internal — r6 verdict
      // item 1): a cell sums corpus/168 q20 values, so int64 holds to
      // ~4·10¹² events at |value| ≤ 10³ (measured 4.2·10¹⁰ at sf0.1);
      // past the envelope the guarded cast raises, never NULLs
      .select(col("dow"), col("hr"), col("n"),
        graft.util.Cols.longEdge(col("sum_q20"), "seasonalProfile sum_q20")
          .as("sum_q20"),
        // IntegralDivide on decimal yields Long; the quotient is
        // value-scaled (≤ 2²⁰·|value|·10³) — safely inside BIGINT
        expr("(sum_q20 * 1000) div n").as("avg_q20m"),
        expr("(n * 1000000) div n_total").as("share_ppm"))
      .orderBy(col("dow"), col("hr"))
  }

  /**
   * Seasonal-aware anomaly detection: an event is flagged iff its
   * value deviates more than `zNumer/zDenom` population standard
   * deviations from ITS OWN (day-of-week, hour) cell — traffic that is
   * normal at Monday 09:00 but anomalous at Sunday 03:00, which the
   * global [[zscoreAnomalies]] cannot see. Same cleared-division
   * integer verdict `(q·n − s)²·zDen² > (n·Q − s²)·zNum²` on the q20
   * lattice — sums, deviations, and squares ALL formed in decimal (a
   * cell's n is corpus-scale, so even q·n overflows Long inside the
   * envelope). Envelope: |value| ≤ 10⁴ AND n ≤ 10⁸ per cell keeps
   * every product — dev² ≤ (2·q·n)² ≈ 4.4·10³⁶ is the largest —
   * inside DECIMAL(38,0); past it, coarsen the lattice or shard the
   * cells before auditing (a 38-digit overflow nulls the predicate
   * under non-ANSI Spark, silently DROPPING the most extreme
   * anomalies — the worst possible failure mode for an anomaly
   * detector). The arithmetic
   * dow/hour keys are shared with [[seasonalProfile]].
   *
   * Scale shape: one ≤168-cell aggregate, broadcast back over the
   * event scan — the event side never shuffles, never sorts.
   */
  def seasonalAnomalies(log: DataFrame, zNumer: Int = 3,
                        zDenom: Int = 1): DataFrame = {
    val ev = log.select(col("event_id"),
        graft.util.Cols.epochUs(col("ts")).as("us"),
        floor(col("value") * 1048576.0).cast("long").as("q"))
      .select(col("event_id"), col("q"),
        expr("((us div 86400000000) + 4) % 7").as("dow"),
        expr("(us div 3600000000) % 24").as("hr"))
    val qDec = col("q").cast("decimal(19,0)")
    // sums and products formed IN decimal from the start (a cell's n
    // is corpus-sized/168, so q*n and sum(q) overflow Long well inside
    // the documented envelope — unlike the per-user zscore shape)
    val cells = ev.groupBy(col("dow"), col("hr")).agg(
      sum(qDec).as("s"), sum(qDec * qDec).as("qq"),
      count(lit(1)).as("n"))
    val dev = qDec * col("n") - col("s")
    ev.join(broadcast(cells), Seq("dow", "hr"))
      .filter(dev * dev * lit(zDenom * zDenom) >
        (col("qq") * col("n") - col("s") * col("s")) *
          lit(zNumer * zNumer))
      .select(col("event_id"), col("dow"), col("hr"),
        col("q").as("value_q20"), col("n").as("n_cell"))
      .orderBy(col("event_id"))
  }

  def trendSlope(log: DataFrame): DataFrame = {
    val ev = log.select(col("user_id"),
      expr("unix_micros(cast(ts as timestamp)) div 60000000")
        .cast("decimal(38,0)").as("x"),
      floor(col("value") * 1048576.0).cast("decimal(38,0)").as("y"))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("user_id"), col("n").cast("long").as("n_events"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
      .filter(col("den") > 0)
      // Output edge: num/den leave as BIGINT, never DECIMAL (the
      // driver's hash renderer treats DECIMAL asymmetrically; r6
      // verdict item 1). Envelope: num ≈ n²·x̄·ȳ per user — measured
      // max 1.5·10¹⁵ at sf0.1, ~6·10³ headroom to int64; past ~10⁵
      // events/user the guarded cast RAISES (as the oracle's CAST
      // does) and the exact pair needs a VARCHAR edge instead.
      .select(col("user_id"), col("n_events"),
        graft.util.Cols.longEdge(col("num"), "trendSlope num").as("num"),
        graft.util.Cols.longEdge(col("den"), "trendSlope den").as("den"),
        (signum(col("num")).cast("long") *
          expr("(abs(num) * 1000000) div den").cast("long"))
          .as("slope_ppm_per_min"))
      .orderBy(col("user_id"))
  }
}

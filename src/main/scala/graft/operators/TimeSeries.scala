package graft.operators

import org.apache.spark.sql.DataFrame
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
      .groupBy(col("word")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("word"))
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
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Physical-layout planning: Morton (Z-order) interleaving for
 * multi-dimensional data skipping.
 *
 * At 100 TB the dominant cost of a selective two-dimensional query
 * (`WHERE user BETWEEN … AND minute BETWEEN …`) is how many files its
 * rectangle touches. A single-column sort clusters one dimension and
 * scatters the other; interleaving the bits of both keys (the Morton
 * curve) gives every file a bounded rectangle in (x, y) space, so
 * min/max file statistics prune BOTH predicates. This is the layout
 * trick behind Delta/Iceberg `ZORDER BY` — here as a pure-arithmetic
 * operator (shifts/masks only, whole-stage codegen, zero shuffles for
 * the key itself; one keyed aggregate for the layout report).
 *
 * All bit math is plain BIGINT shifts/masks, so a DuckDB oracle
 * replays the identical codes — the layout plan itself is
 * hash-verifiable, like the sketch family.
 */
object Layout {

  /** Spread the low 16 bits of `c` to even bit positions (classic
    * bit-twiddling expansion; each step doubles the gap). */
  private def spread16(c: Column): Column = {
    val a0 = c.bitwiseAND(lit(0xFFFFL))
    val a1 = a0.bitwiseOR(shiftleft(a0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val a2 = a1.bitwiseOR(shiftleft(a1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val a3 = a2.bitwiseOR(shiftleft(a2, 2)).bitwiseAND(lit(0x33333333L))
    a3.bitwiseOR(shiftleft(a3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions: x in even bits,
    * y in odd bits. Adjacent codes are adjacent in a space-filling
    * curve, so a contiguous code range covers a bounded rectangle. */
  def mortonKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /**
   * Layout report for writing `df` in Morton order into `2^fileBits`
   * equal code-range files: per file, the row count and the exact
   * (x, y) bounding rectangle its min/max column statistics would
   * expose to a reader. The sum of rectangle areas over files —
   * versus one file covering the whole domain under a 1-D layout —
   * is the measured data-skipping win.
   *
   * Scale shape: the code is a codegen'd projection; the report is
   * ONE aggregate keyed by file id (≤ 2^fileBits groups, map-side
   * combinable). Writing the layout itself is
   * `df.repartitionByRange(col("zfile"))` + per-file local sort —
   * both scale-balanced (range partitioning samples the code
   * distribution).
   */
  def zorderLayout(df: DataFrame, xCol: Column, yCol: Column,
                   bits: Int = 16, fileBits: Int = 6): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits=$bits")
    require(fileBits >= 1 && fileBits <= 2 * bits, s"fileBits=$fileBits")
    // caller maps both dims into [0, 2^bits); top fileBits of the
    // 2·bits-wide code pick the file
    val z = mortonKey(xCol, yCol)
    df.select(xCol.as("x"), yCol.as("y"),
        shiftright(z, 2 * bits - fileBits).as("zfile"))
      .groupBy(col("zfile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .withColumn("rect_area",
        (col("max_x") - col("min_x") + 1) * (col("max_y") - col("min_y") + 1))
      .orderBy(col("zfile"))
  }

  /**
   * Zone-map audit: the per-row-group min/max statistics a parquet
   * reader prunes with, plus — for one range predicate per dimension —
   * whether each group is skippable. This is the planner's view of
   * [[zorderLayout]]'s payoff measured on the ACTUAL layout: a
   * dimension correlated with insertion order (event time in an
   * append-only log) yields tight `[min,max]` zones and most groups
   * skip; an uncorrelated dimension (user id) yields full-domain
   * zones and nothing skips — the printed evidence for why that
   * predicate needs a sort/Z-order rewrite before it can prune at
   * 100 TB, where "groups skipped" is the difference between reading
   * gigabytes and reading everything.
   *
   * `rg` stands in for the physical row group (caller supplies the
   * grouping expression, e.g. `event_id div 4096` for the natural
   * write order). Skippable for `[lo, hi]` ≡ `max < lo or min > hi` —
   * exactly the parquet/iceberg stats predicate.
   *
   * Scale shape: ONE aggregate keyed by row group (map-side combined,
   * output rows = #groups = data/4096, i.e. metadata-sized); the skip
   * flags are per-group scalar arithmetic. All integers — the oracle
   * replays it bit-for-bit.
   */
  def zoneMap(df: DataFrame, rg: Column,
              dim1: Column, lo1: Long, hi1: Long,
              dim2: Column, lo2: Long, hi2: Long): DataFrame =
    df.select(rg.as("rg"), dim1.as("d1"), dim2.as("d2"))
      .groupBy(col("rg"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("d1")).as("min_d1"), max(col("d1")).as("max_d1"),
        min(col("d2")).as("min_d2"), max(col("d2")).as("max_d2"))
      .select(col("rg"), col("n_rows"),
        col("min_d1"), col("max_d1"), col("min_d2"), col("max_d2"),
        (col("max_d1") < lo1 || col("min_d1") > hi1).as("skip_d1"),
        (col("max_d2") < lo2 || col("min_d2") > hi2).as("skip_d2"))
      .orderBy(col("rg"))

  /**
   * Small-file compaction plan over a file manifest
   * `(part, file_id, bytes)` — the operational report that decides
   * when a 100 TB table needs compacting and how much it wins. Files
   * under `smallBytes` are compaction candidates; packing them
   * greedily in id order into `targetBytes` outputs yields
   * `ceil(small_bytes / target)` files (the bin-assignment mechanism
   * itself is the exclusive-prefix-sum pack of
   * [[Multimodal.shardPack]] — this is its planning face). Per
   * partition: file counts before/after, candidate bytes, and the
   * files eliminated — the read-amplification win, since every open
   * costs a metadata round-trip and a seek.
   *
   * Scale shape: the manifest is metadata (one row per FILE, not per
   * record — a 100 TB table is ~10⁵-10⁶ rows here), and the plan is
   * ONE aggregate keyed by partition. `ceil` is integer-exact:
   * `(b + t − 1) div t`.
   */
  def compactionPlan(manifest: DataFrame, smallBytes: Long,
                     targetBytes: Long): DataFrame = {
    require(smallBytes <= targetBytes,
      s"smallBytes=$smallBytes > targetBytes=$targetBytes")
    val small = col("bytes") < smallBytes
    manifest.select(col("part"), col("file_id"), col("bytes"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("bytes")).as("total_bytes"),
        sum(when(small, 1L).otherwise(0L)).as("n_small"),
        sum(when(small, col("bytes")).otherwise(0L)).as("small_bytes"))
      .select(col("part"), col("n_files"), col("total_bytes"),
        col("n_small"), col("small_bytes"),
        // `div` (integer division), not `/` (Spark's `/` on longs
        // returns double)
        expr(s"(small_bytes + ${targetBytes - 1L}) div $targetBytes")
          .as("n_compacted"))
      .withColumn("files_saved",
        when(col("n_small") > 0L,
          col("n_small") - greatest(col("n_compacted"), lit(1L)))
          .otherwise(0L))
      .orderBy(col("part"))
  }
}

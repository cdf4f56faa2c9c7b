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
}

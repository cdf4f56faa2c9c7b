package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal lookup) join: each left row is matched to the most
 * recent right row with the same key and `right.ts <= left.ts` —
 * point-in-time enrichment (latest price / latest dimension version as
 * of the fact's timestamp).
 *
 * Built the scalable way — union + running `last(ignoreNulls)` window —
 * not as a join at all: both sides shuffle ONCE on the key, the window
 * sort is linear per key, and no per-row range probe or O(|L|·|R|)
 * candidate pairing ever materializes. At 100 TB this is the shape that
 * survives: one exchange each side, then a pipelined sort-based window.
 * (DuckDB expresses the same operator natively as `ASOF JOIN`, which is
 * what the oracle uses.)
 */
object AsofJoin {

  /**
   * Left as-of join. Returns every `left` row plus an `asof` struct
   * column holding the matched right row's non-key columns (null when
   * no right row precedes it). Right-side rows at exactly `left.ts`
   * match (`<=` semantics). Right (key, ts) pairs should be unique —
   * with duplicates the row ordered last wins, which is
   * engine-dependent; dedupe first if that matters.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String): DataFrame = {
    val lPay = struct(left.columns.map(col): _*)
    val rPay = struct(right.columns.filterNot(_ == key).map(col): _*)
    val lType = left.select(lPay).schema.head.dataType
    val rType = right.select(rPay).schema.head.dataType
    // __side orders right rows before left rows at equal ts, so a
    // same-instant right row is visible to the left row (<= semantics)
    val l = left.select(col(key).as("__key"), col(tsCol).as("__ts"),
      lit(1).as("__side"), lPay.as("__l"), lit(null).cast(rType).as("__r"))
    val r = right.select(col(key).as("__key"), col(tsCol).as("__ts"),
      lit(0).as("__side"), lit(null).cast(lType).as("__l"), rPay.as("__r"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__asof").as("asof"))
  }

  /**
   * As-of join with a staleness tolerance: a matched right row older
   * than `tolerance` before the left timestamp is treated as no match
   * (the market-data contract — a quote from last week must not price
   * today's trade). Same single-shuffle plan as [[asofJoin]]; the
   * tolerance is a post-filter on the matched struct, whose `tsCol`
   * field carries the right row's timestamp.
   */
  def asofJoinWithin(left: DataFrame, right: DataFrame, key: String,
                     tsCol: String, tolerance: String): DataFrame = {
    val joined = asofJoin(left, right, key, tsCol)
    val rType = joined.schema("asof").dataType
    joined.withColumn("asof",
      when(col(s"asof.$tsCol") >= col(tsCol) - expr(s"INTERVAL $tolerance"),
        col("asof")).otherwise(lit(null).cast(rType)))
  }
}

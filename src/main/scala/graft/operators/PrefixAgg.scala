package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Decomposed prefix aggregation — running max / running sum over a
 * total order WITHOUT a single-partition global window.
 *
 * The naive `agg OVER (ORDER BY o)` moves the whole input to one
 * partition (Spark warns `No Partition Defined for Window operation`).
 * Here the same value is assembled from three levels:
 *
 *   prefix(o) = combine( running agg *within* o's bucket,
 *                        agg of whole buckets before it in its
 *                        super-bucket,
 *                        agg of whole super-buckets before that )
 *
 * Level 1 windows partition by bucket (`o div bucket` — thousands of
 *   balanced partitions over the data);
 * level 2 windows the per-bucket rollups within super-buckets of 4096
 *   buckets (count/`bucket` rows, keyed by super-bucket);
 * level 3 — one row per super-bucket, count/(4096·`bucket`) — is the
 *   only unpartitioned window, then rides a broadcast join.
 *
 * Bit-identical to the naive form at any scale; every data-sized
 * exchange is keyed and balanced. Requirements: `orderCol` is numeric
 * (bucketing is integer arithmetic — works for negatives via pmod
 * floor-alignment) and, for the exclusive sum, UNIQUE (ties would
 * make "strictly before" nondeterministic).
 */
object PrefixAgg {

  /** Inclusive running max of `valueCol` in `orderCol` order, added as
    * `outCol`. Works for any ordered type (timestamps included). */
  def prefixMax(df: DataFrame, orderCol: String, valueCol: String,
                outCol: String, bucket: Long = 8192L): DataFrame =
    core(df, orderCol, valueCol, outCol, bucket, isMax = true)

  /** Exclusive running sum (empty prefix = 0) of a Long `valueCol` in
    * `orderCol` order, added as `outCol`. Envelope: the grand total
    * must fit in Long (cast `valueCol` to decimal upstream past it). */
  def prefixSumExclusive(df: DataFrame, orderCol: String, valueCol: String,
                         outCol: String, bucket: Long = 8192L): DataFrame =
    core(df, orderCol, valueCol, outCol, bucket, isMax = false)

  private def core(df: DataFrame, orderCol: String, valueCol: String,
                   outCol: String, bucket: Long, isMax: Boolean): DataFrame = {
    require(bucket > 0, s"bucket=$bucket")
    val superW = bucket * 4096L
    def aggF(c: Column): Column = if (isMax) max(c) else sum(c)
    val oc = col(orderCol)
    val withB = df
      .withColumn("__b", oc - pmod(oc, lit(bucket)))
      .withColumn("__sb", col("__b") - pmod(col("__b"), lit(superW)))
    // level 1: running agg inside each bucket (inclusive for max,
    // exclusive for sum — matching the public contract)
    val hi: Long = if (isMax) Window.currentRow else -1L
    val wRow = Window.partitionBy(col("__b")).orderBy(oc)
      .rowsBetween(Window.unboundedPreceding, hi)
    val l1 = withB.withColumn("__run", aggF(col(valueCol)).over(wRow))
    // level 2: agg of strictly-previous buckets within the super-bucket
    val bAgg = withB.groupBy(col("__sb"), col("__b"))
      .agg(aggF(col(valueCol)).as("__bm"))
    val wPrevB = Window.partitionBy(col("__sb")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevB = bAgg.withColumn("__pb", aggF(col("__bm")).over(wPrevB))
      .select(col("__b").as("__jb"), col("__pb"))
    // level 3: agg of strictly-previous super-buckets (tiny dimension)
    val wPrevS = Window.orderBy(col("__sb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevS = bAgg.groupBy(col("__sb")).agg(aggF(col("__bm")).as("__sm"))
      .withColumn("__ps", aggF(col("__sm")).over(wPrevS))
      .select(col("__sb").as("__jsb"), col("__ps"))
    val joined = l1.join(prevB, col("__b") === col("__jb"))
      .join(broadcast(prevS), col("__sb") === col("__jsb"))
    val combined =
      if (isMax)
        // greatest skips nulls (first bucket/super has no predecessor)
        greatest(col("__run"), col("__pb"), col("__ps"))
      else
        coalesce(col("__run"), lit(0L)) + coalesce(col("__pb"), lit(0L)) +
          coalesce(col("__ps"), lit(0L))
    joined.withColumn(outCol, combined)
      .drop("__b", "__sb", "__run", "__jb", "__pb", "__jsb", "__ps")
  }
}

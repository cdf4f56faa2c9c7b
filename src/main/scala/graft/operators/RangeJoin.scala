package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: match point-timestamped rows against
 * `[start, end)` intervals WITHOUT an equality key.
 *
 * The naive plan is a broadcast-nested-loop / cross join with a range
 * filter — O(|points|·|intervals|) and a non-starter at scale. This
 * operator uses the standard bucketization: time is cut into
 * fixed-width buckets, each interval is exploded to the buckets it
 * overlaps, each point maps to exactly one bucket, and the two sides
 * meet in an ordinary shuffled equi-join on the bucket id before the
 * exact range predicate prunes false candidates. Work is proportional
 * to true overlap density, both sides shuffle on a well-distributed
 * 8-byte key, and AQE's skew handling applies. Pick `bucketWidthUs`
 * near the typical interval length so intervals explode to O(1)
 * buckets.
 */
object RangeJoin {

  /**
   * Join `points` (with timestamp `tsCol`) to `intervals` (with
   * `startCol` inclusive, `endCol` exclusive, both timestamps).
   * Returns one row per (point, containing interval) with all columns
   * from both sides.
   */
  def intervalJoin(points: DataFrame, tsCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   bucketWidthUs: Long = 900000000L): DataFrame = {
    val p = points.withColumn("__bucket",
      (graft.util.Cols.epochUs(col(tsCol)) / bucketWidthUs).cast("long"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        (graft.util.Cols.epochUs(col(startCol)) / bucketWidthUs).cast("long"),
        (graft.util.Cols.epochUs(col(endCol)) / bucketWidthUs).cast("long"))))
    p.join(i, "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}

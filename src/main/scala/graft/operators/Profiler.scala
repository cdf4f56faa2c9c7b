package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column profiler — the data-quality sweep a training-data pipeline
 * runs before ingesting a new source: per column, null count, distinct
 * count, and min/max (stringified for a uniform schema).
 *
 * One aggregate pass over the scan computes every column's stats
 * (no per-column jobs); the result unpivots to one row per column.
 * At 100 TB swap `countDistinct` for `approx_count_distinct` — the
 * plan shape is identical.
 */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        count(col(c)).as(s"${c}__nonnull"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      wide.select(lit(c).as("col_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        col(s"${c}__nonnull").as("n_nonnull"))
    }.reduce(_ unionAll _)
    stacked
  }
}

package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/**
 * Column helpers that keep the engine agnostic to how parquet timestamp
 * columns surface (TIMESTAMP vs TIMESTAMP_NTZ depends on the session's
 * `spark.sql.parquet.inferTimestampNTZ.enabled`; the session time zone
 * is pinned to UTC so the two agree on the instant).
 */
object Cols {

  /** Epoch microseconds of a timestamp-ish column (NTZ-safe). */
  def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  /**
   * Timestamp literal matching the actual type of `df(colName)`, so the
   * comparison stays same-typed and Catalyst pushes it into the parquet
   * scan (a cast on the column side would defeat pushdown).
   */
  def tsLit(df: DataFrame, colName: String, value: String): Column = {
    val dt = df.schema(colName).dataType match {
      case TimestampNTZType => TimestampNTZType
      case _ => TimestampType
    }
    lit(value).cast(dt)
  }
}

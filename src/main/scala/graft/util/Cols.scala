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

  /**
   * LOUD decimal→BIGINT output-edge cast (the r7 no-DECIMAL-at-edge
   * discipline's failure mode fix): Spark's non-ANSI decimal→long cast
   * returns NULL on overflow, so a value past the documented envelope
   * would silently blank the column — the worst outcome for an audit
   * metric — while the DuckDB oracle's `CAST(... AS BIGINT)` raises.
   * This cast raises on BOTH engines: past ±2⁶³−1 the query fails with
   * the operator's named envelope instead of reporting nulls.
   * Edge frames are aggregate-sized (≤ thousands of rows), so the
   * per-row range check costs nothing.
   */
  def longEdge(c: Column, what: String): Column =
    when(c > lit(Long.MaxValue) || c < lit(Long.MinValue),
      raise_error(concat(lit(s"$what exceeds the BIGINT output envelope: "),
        c.cast("string"))).cast("long"))
      // integral-only: Spark's decimal→long cast truncates toward
      // zero while the oracle's CAST(.. AS BIGINT) rounds half-up —
      // a fractional value would silently diverge by 1 (ADVICE r7).
      // Every current edge is integral by construction; raise rather
      // than pick a rounding if that ever stops being true.
      .when(c =!= floor(c),
        raise_error(concat(lit(s"$what is not integral at the BIGINT " +
          "output edge: "), c.cast("string"))).cast("long"))
      .otherwise(c.cast("long"))
}

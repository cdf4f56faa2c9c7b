package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CdcOps
import graft.streaming.StalenessListener

/**
 * Batch sinks mirroring the reference's outputs (SURVEY.md §2.1 S5/S6),
 * on Spark's transactional file committers instead of per-row
 * `flush()` (`WorkerRunnable.java:211` — deliberately not replicated).
 */
object Sinks {

  /**
   * S5: pipe-delimited chunk files — one output file per partition ≙
   * one `chunk<i>` per worker (`WorkerRunnable.java:75-80,202-216`),
   * null rendered as literal `"null"`. Columns are rendered in the
   * given order.
   */
  def writePipeChunks(df: DataFrame, cols: Seq[Column], path: String,
                      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.select(CdcOps.pipeLine(cols).as("value"))
      .write.mode(mode).text(path)

  /** S5 (generic): `|`-separated CSV of all columns, headerless —
    * byte-compatible with the chunk format for flat schemas. */
  def writePipeCsv(df: DataFrame, path: String,
                   mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("sep", "|").option("header", "false")
      .option("nullValue", "null").csv(path)

  /** The real analytical sink: partitioned parquet (what a 100 TB
    * pipeline lands; the pipe format is for reference fidelity). */
  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /**
   * S6: the metric CSVs (`staleness_*`, `task_processing_time_*`,
   * `CoordinatorRunnable.java:53-64`; `QueryRequestRunnable.java:19-27`)
   * collapse to one queryable frame from the listener.
   */
  def writeMetricsCsv(listener: StalenessListener, spark: SparkSession,
                      path: String): Unit =
    listener.toDF(spark)
      .select(col("batchId"), col("wallClockMs"), col("eventTimeMaxMs"),
        col("stalenessMs"), col("avgStalenessMs"), col("numInputRows"),
        col("batchDurationMs"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
}

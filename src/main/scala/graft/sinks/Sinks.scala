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

  /**
   * Z-ordered parquet write — the ACTIONABLE half of
   * [[graft.operators.Layout.zorderLayout]]'s report: rows are
   * range-partitioned on their Morton code into `2^fileBits` files
   * and locally sorted by the code, so every output file's min/max
   * column statistics expose a BOUNDED rectangle in (x, y) space and
   * a reader's range predicate on EITHER dimension prunes files
   * (Delta/Iceberg `OPTIMIZE ZORDER BY`, as a plain parquet write).
   *
   * Scale shape: the code is a codegen'd projection;
   * `repartitionByRange` samples the code distribution (balanced
   * files under skew); the local sort is per-partition. One shuffle —
   * the same cost as any clustering write.
   */
  def writeZOrdered(df: DataFrame, xCol: Column, yCol: Column,
                    path: String, fileBits: Int = 6,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    // dims are mortonKey's fixed 16-bit contract (coordinates wrap
    // through its 0xFFFF mask); fileBits capped so the Int shift
    // can't wrap (1 << 31 is negative, 1 << 32 is 1)
    require(fileBits >= 1 && fileBits <= 30, s"fileBits=$fileBits")
    df.withColumn("__z", graft.operators.Layout.mortonKey(xCol, yCol))
      .repartitionByRange(1 << fileBits, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

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

  /**
   * Incremental mirror compaction with dynamic partition overwrite —
   * the 100 TB mirror-maintenance pattern: a change batch touches a
   * handful of the mirror's partitions; read ONLY those (partition
   * pruning against the batch's partition values), fold the batch in
   * with the delete-aware mirror upsert, and rewrite ONLY those
   * partitions (`partitionOverwriteMode=dynamic` replaces exactly the
   * partitions present in the written frame). Untouched partition
   * files are never read or rewritten — per-batch cost is
   * O(touched partitions + batch), not O(mirror).
   *
   * The touched-partition values are collected to the driver: that is
   * partition METADATA (bounded by the partition count, the same list
   * the committer itself materializes), not data — the one place a
   * driver-side collect is the correct shape.
   *
   * Caveat (spec-pinned): dynamic overwrite replaces only partitions
   * PRESENT in the written frame, so a batch whose deletes empty a
   * partition entirely leaves the old files in place — the same
   * no-delete-without-data edge every dynamic-overwrite mirror has;
   * a table format with a deletion log (Delta/Iceberg) is the
   * production answer. Guarded here: if a touched partition folds to
   * zero rows, this throws rather than silently resurrecting rows.
   */
  def compactMirror(spark: SparkSession, mirrorDir: String,
                    changes: DataFrame, partCol: String,
                    keyCol: String = "user_id", tsCol: String = "ts",
                    offsetCol: String = "event_id",
                    actionCol: String = "action",
                    maxTouchedPartitions: Int = 100000): Unit = {
    val touched = changes.select(col(partCol)).distinct()
      .limit(maxTouchedPartitions + 1)
      .collect().map(_.get(0)).toSeq
    // The collect above is partition METADATA, bounded by design — but
    // a pathological batch touching every partition of a huge mirror
    // must degrade LOUDLY (and before materializing the list), not as
    // a driver OOM. 100k values ≈ single-digit MB; a batch past that
    // is a full-mirror rewrite, which is not this operator's job.
    require(touched.size <= maxTouchedPartitions,
      s"compactMirror: batch touches > $maxTouchedPartitions partitions " +
        "— that is a full-mirror rewrite, not incremental compaction; " +
        "rewrite the mirror with a plain partitioned write instead")
    val current = spark.read.parquet(mirrorDir)
      .filter(col(partCol).isin(touched: _*))
    // localCheckpoint: materializes the fold (touched-partitions-sized,
    // small vs the mirror) and truncates lineage, so the write-back to
    // the path being read is legal and the emptied-partition guard
    // shares the one fold
    val updated = CdcOps.applyChangesWithActions(current, changes,
      keyCol, tsCol, offsetCol, actionCol).localCheckpoint()
    val survivors = updated.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSet
    val emptied = touched.filterNot(survivors.contains)
    require(emptied.isEmpty,
      s"compactMirror: batch empties partition(s) ${emptied.mkString(",")} " +
        "— dynamic overwrite cannot delete a partition; use a format " +
        "with a deletion log for full-partition deletes")
    updated.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(mirrorDir)
  }
}

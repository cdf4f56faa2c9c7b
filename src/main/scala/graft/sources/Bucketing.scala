package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Bucketed-table layout for co-located joins — the 100 TB answer to
 * "this fact⋈fact join shuffles every run": write both sides bucketed
 * (and sorted) on the join key once; every subsequent sort-merge join
 * on that key runs with ZERO exchange on either side. This is the
 * persistent form of "reuse a partitioning across stages".
 */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: with matched
    * bucket counts Spark plans a SortMergeJoin with no Exchange. */
  def cogroupJoin(spark: org.apache.spark.sql.SparkSession,
                  leftTable: String, rightTable: String,
                  key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}

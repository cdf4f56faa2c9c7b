package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities. AQE's skew-join handling covers most
 * cases at runtime; explicit salting is for the pathological
 * hot-key joins and aggregations AQE can't split (e.g. a single
 * power-law key holding >1 executor's worth of rows).
 */
object SkewJoin {

  /**
   * Salted equi-join: the skewed (big) side scatters each hot key over
   * `salt` sub-keys; the small side replicates `salt`× so every
   * sub-key finds its match. Results are identical to a plain inner
   * equi-join on `key`; the shuffle spreads a hot key over `salt`
   * reducers. Salt assignment is deterministic (hash of the whole row
   * via a stable per-row fingerprint, not rand()), so retried tasks
   * produce identical output — required for exactly-once sinks.
   */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      salt: Int = 16): DataFrame = {
    require(salt > 0)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(salt.toLong))
        .cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Two-phase (salted) aggregation for skewed group-by keys: partial
   * aggregate on (key, salt), then final aggregate on key. For
   * algebraic aggregates Spark's own partial aggregation already does
   * this; use this form when the combine step is itself expensive
   * (e.g. large collect_set/sketch merges on a hot key).
   */
  def twoPhaseCount(df: DataFrame, key: String, salt: Int = 16): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(salt.toLong)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))
}

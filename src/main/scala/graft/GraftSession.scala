package graft

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's recommended configuration — one
 * place for the knobs that must scale with the deployment instead of
 * being hardcoded per query:
 *
 *  - `shuffle.partitions` sized to cores locally (cluster: 2-3× total
 *    executor cores; AQE coalesces down at runtime);
 *  - AQE on with skew-join handling (runtime re-plan replaces manual
 *    salting for most skew);
 *  - `files.maxPartitionBytes` kept at 128m so scan partitions fit in
 *    executor memory at any scale factor;
 *  - UTC session time zone (oracle parity and sane event-time math);
 *  - [[graft.functions.GraftExtensions]] registered so the custom
 *    expressions are SQL-callable.
 */
object GraftSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

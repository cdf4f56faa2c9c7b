package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.model.TableGroups

/**
 * Deterministic synthetic audit change log (FIXTURES.md §A.2): derives
 * the full 17-column `audit.logged_actions` envelope (FIXTURES §A.1,
 * reference `WorkerRunnable.java:202-216`) from the `events` stand-in
 * table — no PostgreSQL required, every column a pure function of the
 * event row, so a DuckDB oracle can reproduce it exactly.
 */
object AuditLogGenerator {

  /** bmsql table for an event: stable event_id → table mapping. */
  private def tableName: Column =
    element_at(array(TableGroups.All.map(lit): _*),
      (pmod(col("event_id"), lit(9)) + 1).cast("int"))

  /** I/U/D action from the event type (deterministic mapping —
    * reused by the delete-aware mirror query). */
  def action: Column =
    when(col("event_type").isin("signup", "purchase"), "I")
      .when(col("event_type").isin("click", "view"), "U")
      .otherwise("D")

  /**
   * PostgreSQL-hstore text rendering of a string map:
   * `"k"=>"v", "k2"=>"v2"`, keys sorted for determinism; null map
   * stays null (pipe sink then renders the literal `null`). One-pass
   * custom expression ([[graft.functions.HstoreRenderExpr]]) — the
   * higher-order composition ran three interpreted array passes plus a
   * map probe per key on the envelope hot path.
   */
  def hstoreString(m: Column): Column =
    graft.functions.functions.hstore_render(m)

  /**
   * The 17-column envelope as a DataFrame (map-typed hstore columns —
   * the Spark-native upgrade over the reference's stringly rows).
   */
  def auditEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = ChangeLogSource.changeLog(spark, sfDir)
    val vDec = col("value").cast("decimal(18,2)").cast("string")
    val kJson = get_json_object(col("props"), "$.k")
    val act = action
    ev.select(
      col("event_id"),
      lit("audit").as("schema_name"),
      tableName.as("table_name"),
      pmod(col("event_id") * 2654435761L, lit(100000L)).as("relid"),
      lit("benchmarksql").as("session_user_name"),
      col("ts").as("action_tstamp_tx"),
      (graft.util.Cols.epochUs(col("ts")) + 1000L).as("action_tstamp_stm_us"),
      (graft.util.Cols.epochUs(col("ts")) + 2000L).as("action_tstamp_clk_us"),
      col("user_id").as("transaction_id"),
      lit("graft").as("application_name"),
      concat(lit("10.0.0."), pmod(col("user_id"), lit(256))).as("client_addr"),
      (lit(5432) + pmod(col("user_id"), lit(100))).cast("int").as("client_port"),
      concat(lit("INSERT INTO "), tableName).as("client_query"),
      act.as("action"),
      map(lit("k"), kJson, lit("v"), vDec).as("row_data"),
      when(act === "I", lit(null).cast(MapType(StringType, StringType)))
        .otherwise(map(lit("v"), vDec)).as("changed_fields"),
      lit(false).as("statement_only"))
  }

  /** The envelope rendered in the reference's 17-field pipe format
    * (`WorkerRunnable.java:202-216`), hstore columns in PG text form. */
  def pipeFormat(audit: DataFrame): DataFrame = {
    import graft.operators.CdcOps
    audit.select(col("event_id"),
      CdcOps.pipeLine(Seq(
        col("event_id"), col("schema_name"), col("table_name"), col("relid"),
        col("session_user_name"), graft.util.Cols.epochUs(col("action_tstamp_tx")),
        col("action_tstamp_stm_us"), col("action_tstamp_clk_us"),
        col("transaction_id"), col("application_name"), col("client_addr"),
        col("client_port"), col("client_query"), col("action"),
        hstoreString(col("row_data")), hstoreString(col("changed_fields")),
        col("statement_only"))).as("line"))
  }
}

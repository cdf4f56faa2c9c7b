package graft.model

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.AuditLogGenerator

/**
 * Typed view of the audit change log — the `Dataset[AuditEvent]` form
 * promised in SURVEY §1.2 for code that wants compile-time field
 * checks (the untyped `DataFrame` pipeline remains the hot path).
 */
object AuditDataset {

  def auditEvents(spark: SparkSession, sfDir: String): Dataset[AuditEvent] = {
    implicit val enc = Encoders.product[AuditEvent]
    AuditLogGenerator.auditEvents(spark, sfDir)
      .select(
        col("event_id").as("eventId"),
        col("schema_name").as("schemaName"),
        col("table_name").as("tableName"),
        col("relid"),
        col("session_user_name").as("sessionUserName"),
        col("action_tstamp_tx").as("actionTstampTx"),
        timestamp_micros(col("action_tstamp_stm_us")).as("actionTstampStm"),
        timestamp_micros(col("action_tstamp_clk_us")).as("actionTstampClk"),
        col("transaction_id").as("transactionId"),
        col("application_name").as("applicationName"),
        col("client_addr").as("clientAddr"),
        col("client_port").as("clientPort"),
        col("client_query").as("clientQuery"),
        col("action"),
        col("row_data").as("rowData"),
        col("changed_fields").as("changedFields"),
        col("statement_only").as("statementOnly"))
      .as[AuditEvent]
  }
}

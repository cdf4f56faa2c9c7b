package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ChangeLogSource.OffsetRange

/**
 * Runtime gate for the S1 production path (`jdbcChangeLog`): executes
 * the stride-partitioned JDBC read against an embedded Apache Derby
 * database (on Spark's unmanaged classpath) — the same
 * coordinator+worker scan the reference runs against PostgreSQL
 * (`Client.java:51-65`, `WorkerRunnable.java:93-98,117-119`), here
 * proven end-to-end: partitioning is gap-free/overlap-free, the range
 * and IN-list predicates reach the database, and the 17-column audit
 * envelope's types survive a JDBC round-trip.
 */
class JdbcChangeLogSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  // Seeded once: 500 change rows, 5 source tables cycling, ids 1..500.
  private lazy val seeded: Unit = {
    System.setProperty("derby.system.home", "target/derby")
    new java.io.File("target/derby").mkdirs()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE changelog (
             event_id BIGINT NOT NULL PRIMARY KEY,
             ts TIMESTAMP NOT NULL,
             user_id BIGINT NOT NULL,
             table_name VARCHAR(64) NOT NULL,
             value DOUBLE NOT NULL,
             props VARCHAR(256))""")
      val ins = conn.prepareStatement(
        "INSERT INTO changelog VALUES (?, ?, ?, ?, ?, ?)")
      val tables = Seq("bmsql_customer", "bmsql_district", "bmsql_history",
        "bmsql_item", "bmsql_new_order")
      for (i <- 1 to 500) {
        ins.setLong(1, i.toLong)
        ins.setTimestamp(2,
          new java.sql.Timestamp(1700000000000L + i * 1000L))
        ins.setLong(3, (i % 50).toLong)
        ins.setString(4, tables((i - 1) % 5))
        ins.setDouble(5, i / 2.0)
        ins.setString(6, s"""{"k":"v$i"}""")
        ins.executeUpdate()
      }
      ins.close(); st.close()
    } finally conn.close()
  }

  private val streams = Seq("bmsql_customer", "bmsql_district", "bmsql_item")

  test("jdbcChangeLog: stride partitions are gap-free, overlap-free, covering") {
    seeded
    val range = OffsetRange(100L, 400L)
    val df = ChangeLogSource.jdbcChangeLog(spark, url, "changelog", range,
      streams, numPartitions = 4, props)
    // 4 strides over (100, 400] — the N-worker split
    assert(df.rdd.getNumPartitions == 4)
    val ids = df.select(col("event_id")).collect().map(_.getLong(0)).sorted
    val expected = (101L to 400L).filter { i =>
      val t = Seq("bmsql_customer", "bmsql_district", "bmsql_history",
        "bmsql_item", "bmsql_new_order")(((i - 1) % 5).toInt)
      streams.contains(t)
    }
    // covering (no gap) AND no duplicates (no overlap): exact multiset
    assert(ids.toSeq == expected)
    // per-partition disjointness: each id lands in exactly one stride
    val perPart = df.select(col("event_id"))
      .rdd.mapPartitionsWithIndex { (p, it) =>
        it.map(r => (r.getLong(0), p)) }.collect()
    assert(perPart.map(_._1).distinct.length == perPart.length)
  }

  test("jdbcChangeLog: range + IN-list predicates push down to the database") {
    seeded
    val df = ChangeLogSource.jdbcChangeLog(spark, url, "changelog",
      OffsetRange(100L, 400L), streams, numPartitions = 2, props)
    val plan = df.queryExecution.executedPlan.toString
    // the JDBC scan node advertises what it shipped to the database:
    // both range bounds and the table IN-list (reference
    // `WorkerRunnable.java:93-94` runs exactly this WHERE server-side)
    // Derby uppercases unquoted identifiers, so the pushed filters
    // advertise EVENT_ID/TABLE_NAME
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(EVENT_ID,100)"), plan)
    assert(plan.contains("LessThanOrEqual(EVENT_ID,400)"), plan)
    assert(plan.contains("In(TABLE_NAME"), plan)
  }

  test("17-column audit envelope type mapping round-trips through JDBC") {
    seeded
    // the envelope with hstore maps rendered to strings (JDBC has no
    // map type — the reference's own sink is stringly too)
    val env = AuditLogGenerator
      .auditEvents(spark, "/root/testdata/sf0.001")
      .filter(col("event_id") <= 40)
      .withColumn("row_data", AuditLogGenerator.hstoreString(col("row_data")))
      .withColumn("changed_fields",
        AuditLogGenerator.hstoreString(col("changed_fields")))
    assert(env.columns.length == 17)
    env.write.mode("overwrite").jdbc(url, "envelope", props)
    // Derby TIMESTAMP is zoneless; when the envelope's tx timestamp is
    // TIMESTAMP_NTZ (NTZ-flavored testdata) the faithful read-back
    // mapping is preferTimestampNTZ, else the default instant type
    val readProps = props
    if (env.schema("action_tstamp_tx").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      readProps.setProperty("preferTimestampNTZ", "true")
    val back = spark.read.jdbc(url, "envelope", readProps)
    // Derby uppercases unquoted identifiers on its side; Spark's JDBC
    // writer quotes, so names and types must both survive verbatim
    assert(back.columns.toSeq == env.columns.toSeq)
    assert(back.schema.map(_.dataType) == env.schema.map(_.dataType))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(back) == rows(env))
  }
}

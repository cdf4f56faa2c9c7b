package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/**
 * TIMESTAMP_NTZ canary (round-5 regression class): the driver's parquet
 * testdata flipped to `isAdjustedToUTC=0` and every raw
 * `unix_micros(ts)` call site hard-errored at ANALYSIS with
 * `DATATYPE_MISMATCH` — silently dropping three queries from the
 * correctness run. This spec forces the worst case: every timestamp
 * column of every table cast to TIMESTAMP_NTZ, then ANALYSIS ONLY
 * (`queryExecution.analyzed` — no execution) over the full
 * `SparkEntry.queries` surface AND both `ScaleCheck` probe lists, so
 * any NTZ-unsafe expression fails here in seconds, not in a driver
 * round. NTZ-safety discipline: `graft.util.Cols.epochUs` /
 * `Cols.tsLit` at every timestamp touch point.
 */
class NtzCanarySpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def toNtz(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(TimestampNTZType))
        case _ => d
      }
    }

  test("every query and scale probe ANALYZES over all-NTZ timestamp tables") {
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("ntz-canary").toString
    tables.foreach { t =>
      toNtz(graft.sources.ChangeLogSource.table(spark, src, t))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // the rewrite must actually surface as NTZ, or the canary is a no-op
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    def analyze(name: String)(f: => DataFrame): Unit =
      try { f.queryExecution.analyzed; () }
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        failures += s"$name: ${msg.linesIterator.take(2).mkString(" | ")}"
      }

    SparkEntry.queries.foreach { case (name, fn) =>
      analyze(s"query $name")(fn(spark, dir))
    }

    val docs = toNtz(graft.sources.ChangeLogSource.table(spark, dir, "documents"))
    val emb = toNtz(graft.sources.ChangeLogSource.table(spark, dir, "embeddings"))
    val ev = toNtz(graft.sources.ChangeLogSource.table(spark, dir, "events"))
    ScaleCheck.docProbes(spark, docs, emb).foreach { case (name, f) =>
      analyze(s"scalecheck $name")(f())
    }
    ScaleCheck.evProbes(spark, ev).foreach { case (name, f) =>
      analyze(s"scalecheck $name")(f())
    }

    assert(failures.isEmpty,
      s"\nNTZ-unsafe plans (${failures.size}):\n${failures.mkString("\n")}")
  }

  test("the app feeder's driver-side row access survives NTZ parquet") {
    // Analysis-only canaries can't catch this class: `Row.getTimestamp`
    // on a collected NTZ column throws ClassCastException (the value
    // arrives as LocalDateTime) only AT RUNTIME — it broke
    // app/Main's feeder while every plan analyzed clean. The guarded
    // shape: convert to epoch micros INSIDE the plan, collect longs.
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("ntz-feeder").toString
    toNtz(graft.sources.ChangeLogSource.table(spark, src, "events"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.sources.ChangeLogSource.table(spark, dir, "events")
      .select(col("event_id"),
        graft.util.Cols.epochUs(col("ts")).as("ts_us"))
      .orderBy("event_id").limit(10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))) // getLong, never getTimestamp
    assert(rows.length == 10)
    assert(rows.forall(_._2 > 0L))
  }
}

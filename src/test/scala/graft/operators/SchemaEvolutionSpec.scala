package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/**
 * Additive schema evolution through the mirror fold: upstream DDL adds
 * (or drops) a column mid-stream and the consumer keeps folding. The
 * contract: a column present on only one side reads NULL on the other
 * — old mirror rows report NULL for a column that did not exist when
 * they were last written, exactly what the source would say for rows
 * never updated after the DDL.
 */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("applyChanges folds a batch that added a column") {
    val mirror = Seq((1L, ts(10), 100L, 5.0), (2L, ts(10), 101L, 6.0))
      .toDF("user_id", "ts", "event_id", "value")
    val batch = Seq((2L, ts(20), 200L, 7.0, "eu"), (3L, ts(20), 201L, 8.0, "us"))
      .toDF("user_id", "ts", "event_id", "value", "region")
    val got = CdcOps.applyChanges(mirror, batch)
      .select($"user_id", $"value", $"region")
      .as[(Long, Double, Option[String])].collect().toSet
    // key 1 untouched -> NULL region; keys 2/3 carry the new column
    assert(got == Set((1L, 5.0, None), (2L, 7.0, Some("eu")),
      (3L, 8.0, Some("us"))))
  }

  test("applyChanges folds a batch that dropped a column") {
    val mirror = Seq((1L, ts(10), 100L, 5.0))
      .toDF("user_id", "ts", "event_id", "value")
    val batch = Seq((1L, ts(20), 200L), (4L, ts(20), 201L))
      .toDF("user_id", "ts", "event_id")
    val got = CdcOps.applyChanges(mirror, batch)
      .select($"user_id", $"value")
      .as[(Long, Option[Double])].collect().toSet
    // both upserts postdate the column drop -> NULL value
    assert(got == Set((1L, None), (4L, None)))
  }

  test("delete-aware fold evolves schema and still applies tombstones") {
    val mirror = Seq((1L, ts(10), 100L, "I", 5.0), (2L, ts(10), 101L, "I", 6.0))
      .toDF("user_id", "ts", "event_id", "action", "value")
    val batch = Seq(
      (1L, ts(20), 200L, "D", 0.0, "x"),   // tombstone with new column
      (3L, ts(20), 201L, "I", 9.0, "y"))
      .toDF("user_id", "ts", "event_id", "action", "value", "tag")
    val got = CdcOps.applyChangesWithActions(mirror, batch)
      .select($"user_id", $"value", $"tag")
      .as[(Long, Double, Option[String])].collect().toSet
    // key 1 deleted; key 2 keeps NULL tag; key 3 arrives with the tag
    assert(got == Set((2L, 6.0, None), (3L, 9.0, Some("y"))))
  }
}

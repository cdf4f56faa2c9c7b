package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingEwma.{EwmaEvent, EwmaPoint}

class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L

  private def run(batches: Seq[Seq[EwmaEvent]], name: String): Map[Long, EwmaPoint] = {
    val input = MemoryStream[EwmaEvent](spark)
    val q = StreamingEwma.smooth(
        input.toDS().withWatermark("ts", "0 seconds").as[EwmaEvent])
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(name).toString)
      .start()
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      spark.table(name).as[EwmaPoint].collect()
        .map(p => p.eventId -> p).toMap
    } finally q.stop()
  }

  test("streaming ewma is row-identical to the batch operator") {
    val rnd = new scala.util.Random(11)
    val events = (1 to 60).map { i =>
      EwmaEvent((i % 3).toLong + 1L, new Timestamp(t0 + i * 1000L),
        i.toLong, rnd.nextDouble() * 40 - 20)
    }
    // state survives and composes across micro-batch boundaries
    val got = run(Seq(events.take(20), events.slice(20, 45),
      events.drop(45)), "ewma_eq")
    val batch = graft.operators.TimeSeries.ewmaSmooth(
        events.toDF("user_id", "ts", "event_id", "value")
          .select($"event_id", $"user_id", $"ts", $"value"))
      .select("event_id", "value_q20", "ewma_q20", "n_lags")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == batch.size)
    batch.foreach { case (eid, (_, vq, ew, nl)) =>
      val p = got(eid)
      assert((p.valueQ20, p.ewmaQ20, p.nLags) == ((vq, ew, nl)), s"event $eid")
    }
  }

  test("idle series are evicted; a revived key restarts its lag buffer") {
    val e1 = EwmaEvent(1L, new Timestamp(t0), 1L, 8.0)
    // 2h later: key 1's state has timed out (1h idle timeout) — its
    // next point must be a fresh head (n_lags = 1), not a continuation
    val e2 = EwmaEvent(1L, new Timestamp(t0 + 7200000L), 2L, 4.0)
    val wm = EwmaEvent(9L, new Timestamp(t0 + 7000000L), 99L, 0.0)
    val got = run(Seq(Seq(e1), Seq(wm), Seq(e2)), "ewma_evict")
    assert(got(1L).nLags == 1L && got(1L).ewmaQ20 == 8L * 1048576)
    assert(got(2L).nLags == 1L, "state not evicted after idle timeout")
    assert(got(2L).ewmaQ20 == 4L * 1048576)
  }
}

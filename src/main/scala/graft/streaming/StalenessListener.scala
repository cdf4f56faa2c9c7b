package graft.streaming

import java.time.Instant

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/**
 * Freshness/throughput metrics listener — the engine-native
 * replacement for the reference's sampler thread and ad-hoc CSV
 * writers (SURVEY.md §3.3):
 *
 *  - staleness (T5): `now − max event time seen` per progress event
 *    (`QueryRequestRunnable.java:35-37`), plus the running average the
 *    sampler kept (`:33,36`);
 *  - throughput (T6): rows and batch duration per trigger —
 *    `WorkerRunnable.java:158-179`'s per-minute counters, provided by
 *    `StreamingQueryProgress` instead of hand-rolled atomics.
 *
 * No polling thread, no shared mutable statics, no data race: the
 * engine pushes progress events.
 */
final case class StalenessSample(batchId: Long, wallClockMs: Long,
                                 eventTimeMaxMs: Option[Long],
                                 stalenessMs: Option[Long],
                                 avgStalenessMs: Option[Double],
                                 numInputRows: Long,
                                 batchDurationMs: Long)

class StalenessListener(clock: () => Long = () => System.currentTimeMillis())
    extends StreamingQueryListener {

  private val buf = new ArrayBuffer[StalenessSample]()
  private var totalStaleness = 0.0
  private var nSamples = 0L

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = synchronized {
    val p = event.progress
    val now = clock()
    val evMax = Option(p.eventTime.get("max"))
      .map(s => Instant.parse(s).toEpochMilli)
    val staleness = evMax.map(m => math.max(0L, now - m))
    staleness.foreach { s => totalStaleness += s.toDouble; nSamples += 1 }
    val avg = if (nSamples > 0) Some(totalStaleness / nSamples) else None
    buf += StalenessSample(p.batchId, now, evMax, staleness, avg,
      p.numInputRows, p.batchDuration)
  }

  def samples: Seq[StalenessSample] = synchronized(buf.toVector)

  /** Samples as a DataFrame — the queryable metric sink that replaces
    * the reference's three CSV files. */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    samples.toDF()
  }
}

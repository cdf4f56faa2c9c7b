package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Per-task processing metrics — the engine-native form of the
 * reference's `task_processing_time_*` CSV (one line per extraction
 * task: `taskCount, processingTime, threadId`, reference
 * `WorkerRunnable.java:152-155`, `CoordinatorRunnable.java:123-130`).
 * Spark's scheduler already measures every task; this listener just
 * surfaces it. One extraction task ≙ one input partition ≙ one Spark
 * task, so the granularity matches the reference exactly — without
 * the shared-Writer race the reference has (SURVEY §3.4).
 */
final case class TaskSample(stageId: Int, taskId: Long, durationMs: Long,
                            recordsRead: Long, executorRunTimeMs: Long,
                            host: String)

class TaskMetricsListener extends SparkListener {
  private val buf = new ArrayBuffer[TaskSample]()

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
    if (e.taskInfo != null && e.taskMetrics != null) {
      buf += TaskSample(e.stageId, e.taskInfo.taskId, e.taskInfo.duration,
        e.taskMetrics.inputMetrics.recordsRead,
        e.taskMetrics.executorRunTime, e.taskInfo.host)
    }
  }

  def samples: Seq[TaskSample] = synchronized(buf.toVector)

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    samples.toDF()
  }
}

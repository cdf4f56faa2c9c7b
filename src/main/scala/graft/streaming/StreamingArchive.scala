package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/**
 * Streaming segment assignment — the live twin of
 * [[graft.operators.Archive.packSegments]]: an archive writer
 * ingesting a capture STREAM must decide each record's
 * (segment, offset) the moment it lands, without re-scanning the
 * corpus the batch cumsum sees. Per writer, a
 * `flatMapGroupsWithState` carries ONE running byte total; a record
 * lands in `seg_id = total / targetBytes` at
 * `seg_offset = total - seg_id·target` — identical arithmetic to the
 * batch window, so the assignment matches row for row when rows
 * arrive in (event-time, doc_id) order, including across micro-batch
 * splits (state carries the total).
 *
 * State is one Long per writer — bounded by the WRITER COUNT (a
 * cluster knob, typically tens), never by stream length or corpus
 * size, so no eviction horizon exists or is needed: a writer's
 * running total must survive for the archive's lifetime or segment
 * offsets would restart and collide. In-batch order is the family's
 * deterministic (ts, doc_id); the batch operator remains the replay
 * / backfill path.
 */
object StreamingArchive {

  final case class RecordRow(docId: Long, ts: Timestamp, writer: Long,
                             length: Long)
  final case class SegAssign(docId: Long, ts: Timestamp, writer: Long,
                             length: Long, bytes_before: Long,
                             seg_id: Long, seg_offset: Long)
  final case class WriterTotal(total: Long)

  /** Segment assignment over `(doc_id, tsCol, writerCol, lengthCol)`:
    * one output row per record. Append-mode stateful map; no state
    * timeout (state is writer-count-bounded and must persist), and
    * deliberately NO watermark — flatMapGroupsWithState never drops
    * late rows and nothing here evicts, so a watermark would only
    * suggest a lateness bound that does not exist. Event time is
    * used for the family's deterministic (ts, doc_id) in-batch
    * order; a record arriving in a later batch appends at the total
    * as of ITS batch (the batch operator is the replay path when
    * strict event-time order matters). */
  def pack(records: DataFrame, targetBytes: Long,
           tsCol: String = "event_time",
           writerCol: String = "writer", lengthCol: String = "length")
      : Dataset[SegAssign] = {
    implicit val rowEnc = Encoders.product[RecordRow]
    implicit val stateEnc = Encoders.product[WriterTotal]
    implicit val outEnc = Encoders.product[SegAssign]
    records.select(col("doc_id").as("docId"), col(tsCol).as("ts"),
        col(writerCol).cast("long").as("writer"),
        col(lengthCol).cast("long").as("length"))
      .as[RecordRow]
      .groupByKey(_.writer)(Encoders.scalaLong)
      .flatMapGroupsWithState[WriterTotal, SegAssign](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[RecordRow],
         state: GroupState[WriterTotal]) =>
          val ordered = rows.toSeq.sortBy(r =>
            (Math.floorDiv(r.ts.getTime, 1000L), r.ts.getNanos, r.docId))
          var total = state.getOption.map(_.total).getOrElse(0L)
          val out = ordered.map { r =>
            val len = math.max(r.length, 0L) // a negative length is
            // corrupt input: assign zero bytes, never rewind the file
            val segId = total / targetBytes
            val a = SegAssign(r.docId, r.ts, r.writer, len, total,
              segId, total - segId * targetBytes)
            total += len
            a
          }
          if (out.nonEmpty) state.update(WriterTotal(total))
          out.iterator
      }
  }
}

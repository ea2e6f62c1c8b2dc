package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.MaterializedView

/** Continuous materialized-view maintenance — [[MaterializedView]]'s
  * delta journal fed by a CDC stream: each micro-batch of event rows
  * carrying an `op` column ('I' insert / 'D' delete) commits as ONE
  * exactly-once journal delta keyed by the stream's micro-batch id.
  * foreachBatch is at-least-once; the journal's atomic rename is the
  * transactional commit, so a crash-replayed micro-batch finds its delta
  * directory present and no-ops — the view never double-counts an insert
  * and, the dangerous direction, never double-DRAINS a delete
  * ([[StreamingIndexer]]'s contract applied to the aggregate store).
  *
  * Retractions riding the same stream as inserts is the standard CDC
  * feed shape (a deletion job emits 'D' rows for what it removed —
  * [[graft.core.DeletionExecutor]]'s deleted-complement frame); the view
  * stays consistent with the base table without ever scanning it.
  *
  * Per micro-batch: one map-side-combined group summary of O(batch)
  * rows; nothing corpus-sized anywhere.
  */
object StreamingMv {

  /** Start the view-maintenance loop over a CDC stream of
    * (ts, event_type, value, op) rows.
    */
  def run(cdcStream: DataFrame, storeDir: String,
      checkpointDir: String, trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = cdcStream.writeStream
      .option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        MaterializedView.applyCdcBatch(batch, storeDir, s"b$batchId")
        ()
      }
      .start()
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.VersionedTable

/** Continuous ingestion into the manifest-versioned table — the
  * [[StreamingIndexer]] shape pointed at [[VersionedTable]]: each
  * micro-batch commits as one table version through
  * [[VersionedTable.appendOnce]], keyed by the stream's epoch id on a
  * per-query channel. `foreachBatch` is at-least-once; the manifest's
  * per-channel txn record makes the APPEND exactly-once — a crash-
  * replayed batch finds its (channel, batchId) already recorded in the
  * head manifest and no-ops, so no row is ever double-appended and every
  * committed version remains a consistent snapshot.
  *
  * The channel also keeps MULTIPLE independent streams (or a stream plus
  * daily batch loads) safely interleaved into one table: each tracks its
  * own latest epoch, and the optimistic commit CAS serializes their
  * version numbers.
  *
  * Scale shape per micro-batch: one O(batch) partitioned write + one
  * manifest CAS — never a table scan; version-count growth is bounded by
  * [[VersionedTable.compact]]/[[VersionedTable.vacuum]] cadence, the same
  * maintenance contract as every journaled store here. Maintenance is
  * safe to schedule ALONGSIDE the running sinks: vacuum/compact/maintain
  * hold the table `_LOCK` against each other, and the vacuum orphan
  * sweep is age-gated so an appender's freshly staged dir is never
  * collected mid-write — a scheduler needs no coordination with the
  * writer channels beyond not running two maintenance jobs at once
  * (the second is refused loudly).
  */
object StreamingVersionedSink {

  /** Start appending the stream's micro-batches to `tableDir` as
    * versions. The table must already exist ([[VersionedTable.create]]).
    */
  def run(stream: DataFrame, tableDir: String, partCol: String,
      checkpointDir: String, channel: String = "stream",
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        VersionedTable.appendOnce(batch, tableDir, partCol, channel, s"b$batchId")
        ()
      }
      .start()
  }
}

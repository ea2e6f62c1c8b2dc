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

  /** [[run]] with CONSTRAINT quarantine routing: each micro-batch splits
    * against the table's head constraints, clean rows commit to the main
    * table and labeled violators to `quarantineDir` — BOTH legs
    * exactly-once per (channel, epoch): the clean leg through
    * [[VersionedTable.appendOnce]], the quarantine leg likewise, with the
    * lazy first-bad-batch table creation recording the same txn entry in
    * its v0 manifest so a crash replay after the create still no-ops.
    * Leg order (clean first) plus the per-leg txn records make every
    * crash point heal on replay without double rows in either table.
    *
    * Contract: constraint changes must not interleave a crashed batch's
    * replay — the replay re-splits against the NEW head constraints, and
    * the already-committed leg no-ops with the OLD split. The same
    * single-coordinator assumption every exactly-once foreachBatch sink
    * carries.
    */
  def runQuarantined(stream: DataFrame, tableDir: String, partCol: String,
      quarantineDir: String, checkpointDir: String,
      channel: String = "stream",
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val (good, bad) =
          VersionedTable.splitByConstraints(batch.localCheckpoint(), tableDir)
        VersionedTable.appendOnce(good, tableDir, partCol, channel, s"b$batchId")
        if (!bad.isEmpty) {
          if (VersionedTable.versions(spark, quarantineDir).isEmpty)
            VersionedTable.create(bad, quarantineDir, partCol,
              txn = Some((channel, s"b$batchId")))
          else
            VersionedTable.appendOnce(bad, quarantineDir, partCol,
              channel, s"b$batchId")
        }
        ()
      }
      .start()
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Search

/** Continuous inverted-index ingestion — [[graft.pipeline.Search]]'s
  * append path run as a stream: each micro-batch of (doc_id, text)
  * documents is committed to the persisted BM25 index through the
  * exactly-once journal, with the stream's micro-batch id as the batch
  * key. `appendToIndex` stages the batch's postings + doclens + stats
  * delta together and commits them by ONE atomic rename to
  * `batches/b<batchId>`, and a crash-replayed micro-batch (foreachBatch
  * is at-least-once) finds its commit directory already present and
  * no-ops — so the store holds every batch's postings EXACTLY once.
  *
  * This closes, for the lexical store, the delivery boundary
  * [[StreamingDedup]] documents for the signature store ("the store
  * append itself is at-least-once on a retry"): the journal's rename IS
  * the transactional commit, no table format needed.
  *
  * A probe between (or during) batches reads base + committed journal
  * roots and scores appended documents exactly as a full rebuild would
  * (`appendToIndex`'s append≡rebuild contract, spec-pinned); a takedown
  * ([[Search.deleteFromIndex]]) can run between micro-batches and binds
  * immediately — both properties exercised by the spec.
  *
  * Scale shape per micro-batch: one batch scan for postings (tf
  * aggregate), column-pruned doclens/stats passes — O(batch) work,
  * never O(corpus); probe-time journal listing stays bounded by
  * [[Search.compactIndex]] cadence exactly as in the daily shape.
  */
object StreamingIndexer {

  /** Start the index-ingestion loop over a (doc_id, text) stream. */
  def run(docsStream: DataFrame, storeDir: String,
      checkpointDir: String, trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Search.appendToIndex(
          batch.select(col("doc_id"), col("text")), storeDir, s"b$batchId")
        ()
      }
      .start()
  }
}

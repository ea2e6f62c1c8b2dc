package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.IncrementalDedup

/** Continuous ingestion dedup — [[graft.pipeline.IncrementalDedup]]'s
  * daily corpus-vs-batch shape run as a stream: each micro-batch of new
  * documents is probed against the persisted MinHash signature/band store
  * AND against itself (the store probe is blind to two dups arriving in
  * the same batch), matches land in a quarantine sink, and only
  * non-duplicate documents are appended to the store — so batch N+1's
  * probe sees batch N's accepted docs (cross-batch dedup, proven by spec).
  *
  * Delivery semantics: the match sink is idempotent under micro-batch
  * retries — each batch overwrites its own `batch_id=N` subdirectory, so
  * a replayed batch rewrites identical content instead of appending
  * duplicates. The store append itself is at-least-once on a retry (plain
  * parquet has no transactional upsert; a replayed append would
  * double-insert signature rows). The standard production hardening is a
  * transactional table format for the store — out of scope here, so the
  * boundary is documented rather than hidden.
  *
  * Scale shape per micro-batch: identical to a daily probe — the batch is
  * scanned once for signatures (typed map, no shuffle), candidates join
  * (band, bucket) id-pairs against the bucket table only, verify re-joins
  * signatures per candidate; O(batch) work per batch, never O(corpus).
  */
object StreamingDedup {

  /** Start the probe-quarantine-append loop over a (doc_id, text) stream.
    * `matchesDir` receives (new_doc_id, corpus_doc_id, est_jaccard) rows
    * under `batch_id=N/`; accepted docs are appended to `storeDir`.
    */
  def run(docsStream: DataFrame, storeDir: String, matchesDir: String,
      checkpointDir: String, threshold: Double = 0.7,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // stage the micro-batch: foreachBatch frames re-execute per action,
        // and the probe + accept paths both consume it
        val docs = batch.select(col("doc_id"), col("text")).cache()
        // corpus-vs-batch matches (probeStore stages the batch signatures
        // under the store; its self-match guard keeps a REPLAYED batch —
        // crash between store append and stream commit — from quarantining
        // its own accepted docs)
        val matches = IncrementalDedup.probeStore(spark, storeDir, docs, threshold)
        // intra-batch near-dups: the store probe is blind to them (both
        // sides arrived in the same batch), so band the staged batch
        // signatures against themselves; the LOWER id of a pair is
        // canonical, the higher is quarantined as its duplicate
        val intra = IncrementalDedup.selfProbe(
          spark.read.parquet(s"$storeDir/batch_staging"), threshold)
        matches.unionByName(intra)
          .write.mode("overwrite").parquet(s"$matchesDir/batch_id=$batchId")
        val dupIds = spark.read.parquet(s"$matchesDir/batch_id=$batchId")
          .select(col("new_doc_id").as("doc_id")).distinct()
        val accepted = docs.join(dupIds, Seq("doc_id"), "left_anti")
        IncrementalDedup.appendToStore(accepted, storeDir)
        docs.unpersist()
        ()
      }
      .start()
  }
}

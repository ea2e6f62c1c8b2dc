package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.AnnIndex

/** Continuous ingestion dedup for EMBEDDINGS — [[StreamingDedup]]'s shape
  * over the persisted ANN index: each micro-batch of (vec_id, embedding)
  * rows is probed against the store ([[AnnIndex.matchStore]], cell-blocked
  * exact-dot matches) AND against itself ([[AnnIndex.selfMatches]] — the
  * store probe is blind to two near-dups arriving together); matches land
  * in a quarantine sink, and only novel vectors are appended — codes to
  * the index ([[AnnIndex.appendToStore]], no retraining) and raw vectors
  * to the store's `vectors/` side table, which is what lets batch N+1's
  * exact-dot probe see batch N's accepted vectors.
  *
  * Store layout addition: `vectors/` — (vec_id, embedding) parquet, the
  * raw-vector side table a production vector store keeps anyway (FAISS's
  * refine storage); seeded by [[seedVectors]] right after
  * [[AnnIndex.buildStore]].
  *
  * Delivery semantics are [[StreamingDedup]]'s, documented not hidden:
  * the quarantine sink is idempotent (each batch overwrites its own
  * `batch_id=N/` directory); the codes/vectors appends are at-least-once
  * on a crash between append and stream commit — and the replayed batch
  * does NOT quarantine itself against its own appended copies, because
  * [[AnnIndex.matchStore]] guards `new_vec_id <> corpus_vec_id`. The two
  * store appends themselves are also non-atomic: vectors/ is written
  * FIRST so the crash-window orphan is an inert raw vector (absent from
  * codes/, so never a candidate) rather than a codes row whose vector is
  * missing — the latter would be silently dropped by matchStore's
  * vector re-join and its near-dups accepted until the replay healed it.
  *
  * Scale shape per micro-batch: batch-sized typed-map assignment, a
  * k-bounded cell IN-list into the codes scan, candidate-cell-only vector
  * re-join, Σ_cell |batch∩cell|·|corpus∩cell| scored pairs — O(batch)
  * driver state (none), never an O(corpus) pass.
  */
object StreamingAnnDedup {

  def vectorsPath(storeDir: String): String = AnnIndex.vectorsPath(storeDir)

  /** Write the corpus raw vectors alongside a freshly built index so the
    * exact-dot probe has its vector side table — id-sharded parquet (see
    * [[AnnIndex.appendVectors]]) so [[AnnIndex.deleteFromStore]] can
    * rewrite only the affected leaves on a takedown.
    */
  def seedVectors(corpus: DataFrame, storeDir: String): Unit =
    AnnIndex.appendVectors(corpus, storeDir, overwrite = true)

  /** Start the probe-quarantine-append loop over a (vec_id, embedding)
    * stream. `matchesDir` receives (new_vec_id, corpus_vec_id, score)
    * rows under `batch_id=N/`; accepted vectors are appended to the store.
    */
  def run(vecStream: DataFrame, storeDir: String, matchesDir: String,
      checkpointDir: String, minScore: Long = 800000L,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = vecStream.writeStream
      .option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val vecs = batch.select(col("vec_id"), col("embedding")).cache()
        val corpus = spark.read.parquet(vectorsPath(storeDir))
        // centroids loaded ONCE per micro-batch and shared by both probes
        // (each would otherwise re-read + collect the store parameters)
        val cents = Some(AnnIndex.loadCentroids(spark, storeDir))
        val matches = AnnIndex.matchStore(spark, storeDir, corpus, vecs,
          minScore, centroids = cents)
        val intra = AnnIndex.selfMatches(spark, storeDir, vecs, minScore,
          centroids = cents)
        matches.unionByName(intra)
          .write.mode("overwrite").parquet(s"$matchesDir/batch_id=$batchId")
        val dupIds = spark.read.parquet(s"$matchesDir/batch_id=$batchId")
          .select(col("new_vec_id").as("vec_id")).distinct()
        val accepted = vecs.join(dupIds, Seq("vec_id"), "left_anti")
        // vectors/ FIRST, codes second: the two appends are not atomic,
        // and a crash between them must leave the benign orphan. A raw
        // vector without its codes row is inert (never a candidate, never
        // matched — exactly what the replay heals); the opposite order
        // would leave codes rows whose vector is absent, and until the
        // replay heals them matchStore's inner join on corpus_vec_id
        // silently DROPS those candidates — near-dups of them get accepted
        AnnIndex.appendVectors(accepted, storeDir)
        AnnIndex.appendToStore(accepted, storeDir)
        vecs.unpersist()
        ()
      }
      .start()
  }
}

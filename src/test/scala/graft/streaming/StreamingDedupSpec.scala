package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.IncrementalDedup
import graft.testkit.SparkTestSession

/** Continuous ingestion dedup: micro-batches probe the persisted store,
  * duplicates are quarantined, accepted docs become visible to LATER
  * batches (the cross-batch property that distinguishes a real
  * incremental store from per-batch self-dedup).
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val corpusText =
    "the original corpus document about spark engines and their shuffle behavior"
  private val freshText =
    "a completely unrelated document discussing gardens tomatoes rainfall and soil quality"

  test("stream probes the store, quarantines dups, and accepts fresh docs into the store") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val (storeDir, matchesDir, ckptDir) = (s"$base/store", s"$base/matches", s"$base/ckpt")
    IncrementalDedup.buildStore(
      Seq((1L, corpusText), (2L, "some other corpus entry mentioning entirely disjoint topics"))
        .toDF("doc_id", "text"),
      storeDir)

    val in = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.run(in.toDF().toDF("doc_id", "text"),
      storeDir, matchesDir, ckptDir)
    try {
      // batch 0: one exact dup of corpus doc 1, one fresh doc
      in.addData((100L, corpusText), (101L, freshText))
      q.processAllAvailable()
      val m0 = spark.read.parquet(s"$matchesDir/batch_id=0")
      assert(m0.select("new_doc_id", "corpus_doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet === Set((100L, 1L)))
      // fresh doc accepted into the store; the dup quarantined out of it
      val sigIds = spark.read.parquet(IncrementalDedup.signaturesPath(storeDir))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(sigIds === Set(1L, 2L, 101L))

      // batch 1: a dup of the doc ACCEPTED in batch 0 — cross-batch dedup
      in.addData((200L, freshText))
      q.processAllAvailable()
      val m1 = spark.read.parquet(s"$matchesDir/batch_id=1")
      assert(m1.select("new_doc_id", "corpus_doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet === Set((200L, 101L)))
      val sigIds1 = spark.read.parquet(IncrementalDedup.signaturesPath(storeDir))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(sigIds1 === Set(1L, 2L, 101L), "the batch-1 dup must not enter the store")
    } finally q.stop()
  }

  test("two dups arriving in the SAME batch: one canonical accepted, one quarantined") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup3").toString
    val (storeDir, matchesDir, ckptDir) = (s"$base/store", s"$base/matches", s"$base/ckpt")
    IncrementalDedup.buildStore(Seq((1L, corpusText)).toDF("doc_id", "text"), storeDir)
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.run(in.toDF().toDF("doc_id", "text"),
      storeDir, matchesDir, ckptDir)
    try {
      // 300 and 301 are identical fresh docs in one batch — the store
      // probe cannot see them; the intra-batch self-band must
      in.addData((300L, freshText), (301L, freshText))
      q.processAllAvailable()
      val m = spark.read.parquet(s"$matchesDir/batch_id=0")
      assert(m.select("new_doc_id", "corpus_doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet === Set((301L, 300L)),
        "the higher id must be quarantined as a dup of the lower (canonical) one")
      val sigIds = spark.read.parquet(IncrementalDedup.signaturesPath(storeDir))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(sigIds === Set(1L, 300L), "only the canonical copy may enter the store")
    } finally q.stop()
  }

  test("bucket table stays consistent with signatures across stream appends") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup2").toString
    val (storeDir, matchesDir, ckptDir) = (s"$base/store", s"$base/matches", s"$base/ckpt")
    IncrementalDedup.buildStore(Seq((1L, corpusText)).toDF("doc_id", "text"), storeDir)
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.run(in.toDF().toDF("doc_id", "text"),
      storeDir, matchesDir, ckptDir)
    try {
      in.addData((10L, freshText), (11L, "yet another novel text about violins and concert halls tonight"))
      q.processAllAvailable()
      val sig = spark.read.parquet(IncrementalDedup.signaturesPath(storeDir))
      val bkt = spark.read.parquet(IncrementalDedup.bucketsPath(storeDir))
      // every signature row has exactly NumBands bucket rows and vice versa
      val badCounts = bkt.groupBy("doc_id").count()
        .where(col("count") =!= graft.pipeline.Dedup.NumBands).count()
      assert(badCounts === 0)
      assert(bkt.select("doc_id").distinct().count() === sig.count())
    } finally q.stop()
  }
}

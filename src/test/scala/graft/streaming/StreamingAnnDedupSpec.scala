package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.AnnIndex
import graft.sources.Tables
import graft.testkit.SparkTestSession

/** Continuous embedding-ingest dedup over the persisted ANN store:
  * micro-batches probe the index with cell-blocked exact-dot matching,
  * near-dups are quarantined, accepted vectors become visible to LATER
  * batches (codes + raw-vector side table both appended).
  */
class StreamingAnnDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def corpusVec(id: Long): Array[Double] = {
    import org.apache.spark.sql.functions._
    Tables.embeddings(spark, sfDir).where(col("vec_id") === id)
      .select(graft.pipeline.Similarity.toDoubleVec(col("embedding")))
      .collect().head.getSeq[Double](0).toArray
  }

  private def bumped(v: Array[Double], at: Int = 7): Array[Double] = {
    val c = v.clone(); c(at) = c(at) + 0.05; c
  }

  test("stream quarantines near-dups of the corpus AND of earlier accepted batches") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sann").toString
    val (storeDir, matchesDir, ckptDir) = (s"$base/store", s"$base/matches", s"$base/ckpt")
    val corpus = Tables.embeddings(spark, sfDir)
    AnnIndex.buildStore(corpus, storeDir)
    StreamingAnnDedup.seedVectors(corpus, storeDir)

    // a vector orthogonal-ish to the corpus: one-hot is nowhere near the
    // dense unit fixture vectors (max natural cosine is far below 0.8)
    val fresh = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)

    val in = MemoryStream[(Long, Seq[Double])](spark)
    val q = StreamingAnnDedup.run(in.toDF().toDF("vec_id", "embedding"),
      storeDir, matchesDir, ckptDir)
    try {
      // batch 0: a near-copy of corpus vector 3 + a genuinely novel vector
      in.addData((900001L, bumped(corpusVec(3L)).toSeq), (900002L, fresh.toSeq))
      q.processAllAvailable()
      val m0 = spark.read.parquet(s"$matchesDir/batch_id=0")
        .select("new_vec_id", "corpus_vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(m0 === Set((900001L, 3L)),
        s"batch 0 must quarantine exactly the planted near-dup, got $m0")
      val stored = spark.read.parquet(AnnIndex.codesPath(storeDir))
        .where("vec_id >= 900000").select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(stored === Set(900002L), "only the novel vector may enter the index")

      // batch 1: a near-copy of the vector ACCEPTED in batch 0 — the
      // cross-batch property (exact-dot side table saw the append)
      in.addData((900003L, bumped(fresh, at = 1).toSeq))
      q.processAllAvailable()
      val m1 = spark.read.parquet(s"$matchesDir/batch_id=1")
        .select("new_vec_id", "corpus_vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(m1 === Set((900003L, 900002L)),
        s"batch 1 must match against the batch-0 accepted vector, got $m1")
    } finally q.stop()
  }

  test("two near-dups in ONE batch: lower id canonical, higher quarantined") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sann2").toString
    val (storeDir, matchesDir, ckptDir) = (s"$base/store", s"$base/matches", s"$base/ckpt")
    val corpus = Tables.embeddings(spark, sfDir)
    AnnIndex.buildStore(corpus, storeDir)
    StreamingAnnDedup.seedVectors(corpus, storeDir)
    val fresh = Array.tabulate(64)(i => if (i == 5) 1.0 else 0.0)
    val in = MemoryStream[(Long, Seq[Double])](spark)
    val q = StreamingAnnDedup.run(in.toDF().toDF("vec_id", "embedding"),
      storeDir, matchesDir, ckptDir)
    try {
      in.addData((910L, fresh.toSeq), (911L, bumped(fresh, at = 6).toSeq))
      q.processAllAvailable()
      val m = spark.read.parquet(s"$matchesDir/batch_id=0")
        .select("new_vec_id", "corpus_vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(m === Set((911L, 910L)),
        s"the higher id must be quarantined as the dup, got $m")
      val stored = spark.read.parquet(AnnIndex.codesPath(storeDir))
        .where("vec_id >= 900").select("vec_id").collect().map(_.getLong(0)).toSet
      assert(stored === Set(910L), "only the canonical copy may enter the index")
    } finally q.stop()
  }

  test("checkpointed restart: committed batches stay committed, new dups still match") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sann-restart").toString
    val (srcDir, storeDir, matchesDir, ckptDir) =
      (s"$base/src", s"$base/store", s"$base/matches", s"$base/ckpt")
    val corpus = Tables.embeddings(spark, sfDir)
    AnnIndex.buildStore(corpus, storeDir)
    StreamingAnnDedup.seedVectors(corpus, storeDir)
    def runOnce(): Unit = {
      val in = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<DOUBLE>").parquet(srcDir)
      val q = StreamingAnnDedup.run(in, storeDir, matchesDir, ckptDir,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
    }
    val fresh = Array.tabulate(64)(i => if (i == 30) 1.0 else 0.0)
    // run 1: a near-dup of corpus vector 2 (quarantined) + a novel vector
    Seq((940L, bumped(corpusVec(2L)).toSeq), (941L, fresh.toSeq))
      .toDF("vec_id", "embedding").write.mode("append").parquet(srcDir)
    runOnce()
    val n941 = spark.read.parquet(StreamingAnnDedup.vectorsPath(storeDir))
      .where("vec_id >= 900").select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(n941.sorted === Seq(941L))
    // run 2 (restart from the same checkpoint): a near-dup of the vector
    // accepted BEFORE the restart — store and checkpoint both carried over
    Seq((950L, bumped(fresh, at = 31).toSeq))
      .toDF("vec_id", "embedding").write.mode("append").parquet(srcDir)
    runOnce()
    val matches = spark.read.parquet(matchesDir)
      .select("new_vec_id", "corpus_vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches === Set((940L, 2L), (950L, 941L)),
      s"restart must keep run-1 matches and detect the cross-restart dup, got $matches")
    // exactly-once store content: a replayed run-1 batch would append
    // 941's codes and raw vector twice
    val stored = spark.read.parquet(AnnIndex.codesPath(storeDir))
      .where("vec_id >= 900").select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(stored.sorted === Seq(941L),
      s"store must hold each accepted vector exactly once, got ${stored.sorted}")
    val rawIds = spark.read.parquet(StreamingAnnDedup.vectorsPath(storeDir))
      .where("vec_id >= 900").select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(rawIds.sorted === Seq(941L))
  }

  test("ingest matcher nProbe dominance: widening the probe only adds matches") {
    val base = java.nio.file.Files.createTempDirectory("graft-sann-np").toString
    val storeDir = s"$base/store"
    val corpus = Tables.embeddings(spark, sfDir)
    AnnIndex.buildStore(corpus, storeDir)
    val batch = graft.pipeline.Similarity.plantNearDups(corpus)
      .where(org.apache.spark.sql.functions.col("vec_id") >= 10000000L)
    def pairs(nProbe: Int): Set[(Long, Long)] =
      AnnIndex.matchStore(spark, storeDir, corpus, batch, nProbe = nProbe)
        .select("new_vec_id", "corpus_vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairs(1); val p2 = pairs(2)
    assert(p1.nonEmpty, "the planted batch must produce matches")
    assert(p1.subsetOf(p2),
      s"nProbe=2 must contain every nProbe=1 match; missing ${p1 -- p2}")
  }

  test("store maintenance: compaction shrinks append litter, probes unchanged") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sann4").toString
    val storeDir = s"$base/store"
    val corpus = Tables.embeddings(spark, sfDir)
    AnnIndex.buildStore(corpus, storeDir)
    StreamingAnnDedup.seedVectors(corpus, storeDir)
    // simulate ingest litter: several tiny appends, one file set each
    (0 until 5).foreach { i =>
      val v = Array.tabulate(64)(j => if (j == 20 + i) 1.0 else 0.0)
      val b = Seq((930L + i, v.toSeq)).toDF("vec_id", "embedding")
      AnnIndex.appendToStore(b, storeDir)
      AnnIndex.appendVectors(b, storeDir)
    }
    // recursive: codes/ and vectors/ are sharded (shard=N leaf dirs)
    def files(p: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(p))
    }
    val codesBefore = files(AnnIndex.codesPath(storeDir))
    val rowsBefore = spark.read.parquet(AnnIndex.codesPath(storeDir)).count()
    val probeBefore = AnnIndex.probeStore(spark, storeDir,
      Array(5L -> corpusVec(5L))).collect().toSeq
    val report = AnnIndex.compactStore(spark, storeDir, targetBytes = 256L << 20)
    assert(report.keySet === Set("codes", "vectors"))
    assert(files(AnnIndex.codesPath(storeDir)) < codesBefore,
      "compaction must reduce the codes file count")
    assert(spark.read.parquet(AnnIndex.codesPath(storeDir)).count() === rowsBefore,
      "compaction must not change the row set")
    val probeAfter = AnnIndex.probeStore(spark, storeDir,
      Array(5L -> corpusVec(5L))).collect().toSeq
    assert(probeAfter === probeBefore, "probes must be unchanged by compaction")
  }

  test("takedown mid-stream: a deleted corpus vector stops matching later batches") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sann-td").toString
    val (storeDir, matchesDir, ckptDir) = (s"$base/store", s"$base/matches", s"$base/ckpt")
    val corpus = Tables.embeddings(spark, sfDir)
    AnnIndex.buildStore(corpus, storeDir)
    StreamingAnnDedup.seedVectors(corpus, storeDir)
    val in = MemoryStream[(Long, Seq[Double])](spark)
    val q = StreamingAnnDedup.run(in.toDF().toDF("vec_id", "embedding"),
      storeDir, matchesDir, ckptDir)
    try {
      // batch 0: a near-copy of corpus vector 4 is quarantined against it
      in.addData((960L, bumped(corpusVec(4L)).toSeq))
      q.processAllAvailable()
      val m0 = spark.read.parquet(s"$matchesDir/batch_id=0")
        .select("new_vec_id", "corpus_vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(m0 === Set((960L, 4L)))
      // takedown vector 4 BETWEEN micro-batches — codes and raw-vector
      // leaves both rewritten; the stream keeps running over the store
      AnnIndex.deleteFromStore(spark, storeDir, Seq(4L))
      // batch 1: another near-copy of the deleted vector must now be
      // ACCEPTED — a served takedown cannot keep haunting ingest matching
      in.addData((961L, bumped(corpusVec(4L), at = 8).toSeq))
      q.processAllAvailable()
      val m1dir = new java.io.File(s"$matchesDir/batch_id=1")
      val m1 =
        if (!m1dir.exists()) Set.empty[(Long, Long)]
        else spark.read.parquet(m1dir.toString)
          .select("new_vec_id", "corpus_vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!m1.exists(_._2 == 4L),
        s"deleted vector 4 still matches post-takedown batches: $m1")
      val stored = spark.read.parquet(AnnIndex.codesPath(storeDir))
        .where("vec_id >= 960").select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(stored.contains(961L),
        "the post-takedown near-copy must be accepted into the store")
    } finally q.stop()
  }

  test("replay shield: a batch re-probed after its own append does not self-quarantine") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sann3").toString
    val storeDir = s"$base/store"
    val corpus = Tables.embeddings(spark, sfDir)
    AnnIndex.buildStore(corpus, storeDir)
    StreamingAnnDedup.seedVectors(corpus, storeDir)
    val fresh = Array.tabulate(64)(i => if (i == 9) 1.0 else 0.0)
    val batch = Seq((920L, fresh.toSeq)).toDF("vec_id", "embedding")
    // simulate the crash-after-append replay: the batch's vectors are
    // already in the store under their own ids when the probe re-runs
    AnnIndex.appendToStore(batch, storeDir)
    AnnIndex.appendVectors(batch, storeDir)
    val vectors = spark.read.parquet(StreamingAnnDedup.vectorsPath(storeDir))
    val matches = AnnIndex.matchStore(spark, storeDir, vectors, batch)
    assert(matches.where("new_vec_id = 920 AND corpus_vec_id = 920").count() === 0L,
      "a replayed batch must not match its own appended copy (id guard)")
  }
}

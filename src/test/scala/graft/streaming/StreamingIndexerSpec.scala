package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Search, Stores}
import graft.sources.Tables
import graft.testkit.SparkTestSession

/** Continuous BM25 indexing: streamed batches score exactly like a full
  * rebuild, replays are exactly-once (the journal commit is the shield),
  * and a takedown between micro-batches binds immediately.
  */
class StreamingIndexerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def ranked(dir: String) =
    Search.probeIndex(spark, dir, Search.QueryTerms)
      .select("query_id", "rank", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  test("streamed batches probe identically to a full rebuild") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val streamed = Stores.temp("sidx-streamed")
    // base = 3/5 of the corpus; the rest arrives as two micro-batches
    Search.buildIndex(docs.where(col("doc_id") % 5 < 3), streamed)
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamingIndexer.run(in.toDF().toDF("doc_id", "text"),
      streamed, Stores.temp("sidx-ckpt"))
    try {
      val part = docs.select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      in.addData(part.filter(_._1 % 5 == 3).toSeq: _*)
      q.processAllAvailable()
      in.addData(part.filter(_._1 % 5 == 4).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val rebuilt = Stores.temp("sidx-rebuilt")
    Search.buildIndex(docs, rebuilt)
    assert(ranked(streamed) === ranked(rebuilt),
      "streamed index must score probe-for-probe like a full rebuild")
  }

  test("a crash-replayed micro-batch is a no-op: postings stay exactly-once") {
    val docs = Tables.documents(spark, sfDir)
    val dir = Stores.temp("sidx-replay")
    Search.buildIndex(docs.where(col("doc_id") % 5 =!= 0), dir)
    val batch = docs.where(col("doc_id") % 5 === 0).select("doc_id", "text")
    // first delivery commits batches/b0; the replay (foreachBatch retry
    // after a crash between append and stream commit) re-runs the same
    // call with the same batch id and must find the commit and no-op
    Search.appendToIndex(batch, dir, "b0")
    val after1 = ranked(dir)
    Search.appendToIndex(batch, dir, "b0")
    assert(ranked(dir) === after1,
      "replayed batch must not change any probe result")
  }

  test("takedown between micro-batches binds immediately") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val dir = Stores.temp("sidx-td")
    Search.buildIndex(docs.where(col("doc_id") % 5 =!= 0), dir)
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamingIndexer.run(in.toDF().toDF("doc_id", "text"),
      dir, Stores.temp("sidx-td-ckpt"))
    try {
      val part = docs.select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      in.addData(part.filter(_._1 % 5 == 0).toSeq: _*)
      q.processAllAvailable()
      // the streamed batch's docs are now probe-visible; take one down
      val victim = part.filter(_._1 % 5 == 0).map(_._1).min
      Search.deleteFromIndex(spark, dir, Seq(victim), "sidx-td-1")
      assert(!ranked(dir).exists(_._3 == victim),
        "takedown must bind for journal-resident documents")
      // the stream keeps running over the store after the delete
      in.addData((9000001L, "join hash batch"))
      q.processAllAvailable()
      assert(Search.doclensDf(spark, dir)
        .where(col("doc_id") === 9000001L).count() === 1L)
    } finally q.stop()
  }
}

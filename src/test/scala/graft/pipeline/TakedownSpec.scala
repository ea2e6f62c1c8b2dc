package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

/** Cross-store takedown: one call must remove the ids from every derived
  * store, account for every artifact exactly, and be replay-safe.
  */
class TakedownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def buildAll(): (Takedown.StoreSet, Seq[Long], Seq[Long]) = {
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)
    val bm = Stores.temp("tds-bm25")
    val ann = Stores.temp("tds-ann")
    val mh = Stores.temp("tds-minhash")
    Search.buildIndex(docs, bm)
    AnnIndex.buildStore(embs, ann)
    IncrementalDedup.buildStore(docs, mh)
    val docIds = docs.where(col("doc_id") % 7 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val vecIds = embs.where(col("vec_id") % 7 === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    (Takedown.StoreSet(Some(bm), Some(ann), Some(mh)), docIds, vecIds)
  }

  test("propagate removes the ids from every store with exact accounting") {
    val (set, docIds, vecIds) = buildAll()
    val report = Takedown.propagate(spark, set, docIds, vecIds, "tds-1")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(report.keySet === Set("ann/codes", "bm25/postings",
      "bm25/doclens", "bm25/stats_n_docs", "bm25/stats_sum_dl",
      "minhash/signatures", "minhash/buckets"))
    // every artifact: residual 0, rows strictly removed
    report.foreach { case (artifact, (before, after, residual)) =>
      assert(residual === 0L, s"$artifact still shows deleted ids")
      assert(before > after, s"$artifact removed nothing")
    }
    // doc-count-keyed artifacts drop by exactly the id count
    val nDocs = report("bm25/doclens")._1
    assert(report("bm25/doclens")._2 === nDocs - docIds.length)
    assert(report("bm25/stats_n_docs")._2 === nDocs - docIds.length)
    assert(report("minhash/signatures")._2 === nDocs - docIds.length)
    assert(report("minhash/buckets")._2 ===
      Dedup.NumBands * (nDocs - docIds.length))
    assert(report("ann/codes")._2 === report("ann/codes")._1 - vecIds.length)
    // post-delete probes surface no deleted id
    val bmHits = Search.probeIndex(spark, set.bm25.get, Search.QueryTerms)
      .where(col("doc_id").isin(docIds: _*)).count()
    assert(bmHits === 0L, "BM25 probe still returns a deleted doc")
    val mhHits = IncrementalDedup.probeStore(spark, set.minhash.get,
        Tables.documents(spark, sfDir).where(col("doc_id") % 7 === 1), 0.5)
      .where(col("corpus_doc_id").isin(docIds: _*)).count()
    assert(mhHits === 0L, "MinHash probe still matches a deleted doc")
  }

  test("replaying the same request is a no-op on every artifact") {
    val (set, docIds, vecIds) = buildAll()
    val first = Takedown.propagate(spark, set, docIds, vecIds, "tds-replay")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    // same batchId, same ids — the crash-heal path
    val replay = Takedown.propagate(spark, set, docIds, vecIds, "tds-replay")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    replay.foreach { case (artifact, (before, after, residual)) =>
      assert(before === first(artifact)._1,
        s"$artifact changed between delete and replay")
      assert(after === first(artifact)._1, s"$artifact shrank on replay")
      assert(residual === 0L)
    }
  }

  test("accounting sees journaled append batches, not just the base tables") {
    val docs = Tables.documents(spark, sfDir)
    val bm = Stores.temp("tds-bm-journal")
    // base = 4/5 of the corpus; the remaining 1/5 arrives as an append
    // batch and lives under batches/<id>/, not the base postings root
    Search.buildIndex(docs.where(col("doc_id") % 5 =!= 0), bm)
    Search.appendToIndex(docs.where(col("doc_id") % 5 === 0), bm, "day1")
    // take down docs that live ONLY in the journal batch
    val docIds = docs.where(col("doc_id") % 5 === 0 && col("doc_id") % 2 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val report = Takedown.propagate(spark,
        Takedown.StoreSet(bm25 = Some(bm)), docIds, Nil, "tds-journal")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (dBefore, dAfter, dRes) = report("bm25/doclens")
    assert(dBefore === docs.count(),
      "before-count must include the journaled batch's doclens")
    assert(dAfter === docs.count() - docIds.length,
      "after-count must see the journal rewrite")
    assert(dRes === 0L, "journal-resident deleted docs still visible")
    val (pBefore, pAfter, pRes) = report("bm25/postings")
    assert(pBefore > pAfter && pRes === 0L)
  }

  test("a takedown that empties a store still produces the audit report") {
    import spark.implicits._
    val mh = Stores.temp("tds-wipe")
    val tiny = Seq((3L, "alpha beta"), (17L, "gamma delta"))
      .toDF("doc_id", "text")
    IncrementalDedup.buildStore(tiny, mh)
    val report = Takedown.propagate(spark,
        Takedown.StoreSet(minhash = Some(mh)), Seq(3L, 17L), Nil, "tds-wipe")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(report("minhash/signatures") === ((2L, 0L, 0L)),
      "full wipe must report before=2, after=0, residual=0 — not crash")
    assert(report("minhash/buckets") ===
      ((2L * Dedup.NumBands, 0L, 0L)))
  }

  test("takedown reaches the MV and versioned base; vacuum erases all history") {
    val events = Tables.events(spark, sfDir)
      .where(col("event_id") < 500)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
    val vt = Stores.temp("tds-vt")
    val mv = Stores.temp("tds-mv")
    graft.sources.VersionedTable.create(events, vt, "pdate")
    // grow some history so vacuum has versions to erase
    graft.sources.VersionedTable.delete(spark, vt, "pdate", lit(false))
    MaterializedView.buildView(events, mv)
    val pred = col("user_id") % 5 === 2
    val deletedN = events.filter(pred).count()
    assert(deletedN > 0, "fixture must exercise a non-empty takedown")
    val set = Takedown.StoreSet(mv = Some(mv),
      versioned = Some(Takedown.VersionedRef(vt, "pdate")))
    val report = Takedown.propagate(spark, set, Nil, Nil, "tds-base",
        basePred = Some(pred))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(report.keySet === Set("mv/rows", "versioned/rows"))
    assert(report("versioned/rows") === ((500L, 500L - deletedN, 0L)))
    assert(report("mv/rows") === ((500L, 500L - deletedN, 0L)))
    // erasure contract: ONLY the post-delete version is retained, and no
    // retained snapshot can read a deleted row (time travel is not a
    // takedown bypass)
    val vs = graft.sources.VersionedTable.versions(spark, vt)
    assert(vs.size === 1)
    assert(graft.sources.VersionedTable
      .readVersion(spark, vt, vs.head).filter(pred).count() === 0L)
    // the pre-delete versions are physically gone, not just hidden
    intercept[IllegalArgumentException] {
      graft.sources.VersionedTable.readVersion(spark, vt, 0)
    }
    // MV equals a recompute over the post-delete base
    val mvTotal = MaterializedView.readView(spark, mv)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(mvTotal === 500L - deletedN)

    // replay with the same batchId: every leg a no-op, residuals still 0
    val replay = Takedown.propagate(spark, set, Nil, Nil, "tds-base",
        basePred = Some(pred))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(replay("versioned/rows") ===
      ((500L - deletedN, 500L - deletedN, 0L)))
    assert(replay("mv/rows") === ((500L - deletedN, 500L - deletedN, 0L)))
  }

  test("an MV leg without its versioned base is refused") {
    val events = Tables.events(spark, sfDir).where(col("event_id") < 100)
    val mv = Stores.temp("tds-mv-orphan")
    MaterializedView.buildView(events, mv)
    intercept[IllegalArgumentException] {
      Takedown.propagate(spark, Takedown.StoreSet(mv = Some(mv)),
        Nil, Nil, "tds-orphan-mv", basePred = Some(lit(true)))
    }
    // and base legs without a predicate are refused too
    intercept[IllegalArgumentException] {
      Takedown.propagate(spark,
        Takedown.StoreSet(versioned = Some(Takedown.VersionedRef(mv, "x"))),
        Nil, Nil, "tds-nopred")
    }
  }

  test("empty stores in the set are skipped, empty id lists delete nothing") {
    val docs = Tables.documents(spark, sfDir)
    val mh = Stores.temp("tds-mh-only")
    IncrementalDedup.buildStore(docs, mh)
    val report = Takedown.propagate(spark,
        Takedown.StoreSet(minhash = Some(mh)), Nil, Nil, "tds-empty")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(report.keySet === Set("minhash/signatures", "minhash/buckets"))
    report.foreach { case (_, (before, after)) => assert(before === after) }
  }

  test("the access report is read-only and a post-takedown report reads all zeros") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 100)
    val mh = Stores.temp("tds-ar-mh")
    val vt = Stores.temp("tds-ar-vt")
    IncrementalDedup.buildStore(docs, mh)
    graft.sources.VersionedTable.create(
      docs.select(col("doc_id"), col("lang")), vt, "lang")
    val set = Takedown.StoreSet(minhash = Some(mh),
      versioned = Some(Takedown.VersionedRef(vt, "lang")))
    val subject = Seq(7L, 14L, 21L)
    val pred = col("doc_id").isin(subject: _*)
    val before = Takedown.accessReport(spark, set, subject, Nil,
        basePred = Some(pred))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before("minhash/signatures") === 3)
    assert(before("versioned/head") === 3)
    // read-only: no store version moved, no journal entry appeared
    assert(graft.sources.VersionedTable.versions(spark, vt) === Seq(0))
    // takedown, then the same report must read zero everywhere —
    // including every retained snapshot
    Takedown.propagate(spark, set, subject, Nil, "tds-ar-del",
      basePred = Some(pred))
    val after = Takedown.accessReport(spark, set, subject, Nil,
        basePred = Some(pred))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.values.forall(_ === 0L),
      s"post-takedown access report must be all zeros: $after")
  }
}

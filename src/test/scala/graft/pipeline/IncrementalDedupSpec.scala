package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

/** The incremental probe must agree with the self-dedup operator on the
  * corpus×batch cross pairs, never recompute the corpus side from raw
  * documents, and support the daily build → probe → append → probe cycle.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("probe output equals the self-dedup pairs restricted to corpus-batch cross pairs") {
    val incr = IncrementalDedup.dedupIncremental(spark, sfDir)
      .select("new_doc_id", "corpus_doc_id", "est_jaccard").cache()
    // minHashLsh emits id_a < id_b over the whole corpus; keep pairs where
    // exactly the batch-side rule (doc_id % 5 = 0) holds on one side, and
    // normalize to (new, corpus) orientation
    val all = Dedup.minHashLsh(spark, sfDir)
    val cross = all.where((col("id_a") % 5 === 0) =!= (col("id_b") % 5 === 0))
      .select(
        when(col("id_a") % 5 === 0, col("id_a")).otherwise(col("id_b")).as("new_doc_id"),
        when(col("id_a") % 5 === 0, col("id_b")).otherwise(col("id_a")).as("corpus_doc_id"),
        col("est_jaccard"))
    assert(incr.count() > 0, "fixture corpus must contain cross near-dups")
    assert(incr.except(cross).count() === 0)
    assert(cross.except(incr).count() === 0)
  }

  test("probe plan reads only the store: no raw-document scan survives") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // isolated session + AQE off so FileSourceScanExec nodes are statically
    // visible (under AQE they hide inside AdaptiveSparkPlanExec)
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val store = Files.createTempDirectory("graft-incr-plan").toString
    val docs = Tables.documents(s, sfDir)
    IncrementalDedup.buildStore(docs.where(col("doc_id") % 5 =!= 0), store)
    val probe = IncrementalDedup.probeStore(s, store,
      docs.where(col("doc_id") % 5 === 0))
    val scans = probe.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec => sc.relation.location.rootPaths.mkString(",")
    }
    assert(scans.nonEmpty)
    assert(scans.forall(p => p.contains(store)),
      s"probe must scan the store only, found scans of:\n${scans.mkString("\n")}")
    // the candidate join must touch the narrow bucket table, not signatures
    assert(scans.exists(_.contains("buckets")))
  }

  test("daily cycle: append day-1 batch, day-2 probe finds day-1 near-dups from the store") {
    val store = Files.createTempDirectory("graft-incr-daily").toString
    val docs = Tables.documents(spark, sfDir)
    // day 0: corpus = everything except two held-out batches
    IncrementalDedup.buildStore(docs.where(col("doc_id") % 5 =!= 0), store)
    val day1 = docs.where(col("doc_id") % 5 === 0 && col("doc_id") % 2 === 0)
    val day2 = docs.where(col("doc_id") % 5 === 0 && col("doc_id") % 2 =!= 0)
    IncrementalDedup.probeStore(spark, store, day1).count() // probe, then accept all
    IncrementalDedup.appendToStore(day1, store)
    val hits2 = IncrementalDedup.probeStore(spark, store, day2)
      .select(least(col("new_doc_id"), col("corpus_doc_id")).as("lo"),
        greatest(col("new_doc_id"), col("corpus_doc_id")).as("hi")).cache()
    // after the append, the store holds corpus + day1, so day-2 hits must
    // equal EXACTLY the self-dedup pairs with one endpoint in day2 (the
    // orientation-normalized cross pairs) — day-1 docs answer as corpus
    val isDay2 = (c: org.apache.spark.sql.Column) => c % 5 === 0 && c % 2 =!= 0
    val expected = Dedup.minHashLsh(spark, sfDir)
      .where(isDay2(col("id_a")) =!= isDay2(col("id_b")))
      .select(least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
    assert(hits2.except(expected).count() === 0)
    assert(expected.except(hits2).count() === 0)
  }

  test("delete-from-store: probe equals a rebuild over the survivors, and differs from pre-delete") {
    val docs = Tables.documents(spark, sfDir)
    val store = Files.createTempDirectory("graft-incr-del-a").toString
    IncrementalDedup.buildStore(docs.where(col("doc_id") % 5 =!= 0), store)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val before = IncrementalDedup.probeStore(spark, store, batch)
      .orderBy("new_doc_id", "corpus_doc_id").collect().toSeq
    val ids = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.nonEmpty)
    IncrementalDedup.deleteFromStore(spark, store, ids)
    val after = IncrementalDedup.probeStore(spark, store, batch)
      .orderBy("new_doc_id", "corpus_doc_id").collect().toSeq
    val rebuilt = Files.createTempDirectory("graft-incr-del-b").toString
    IncrementalDedup.buildStore(
      docs.where(col("doc_id") % 5 =!= 0 && !(col("doc_id") % 7 === 1)), rebuilt)
    val ref = IncrementalDedup.probeStore(spark, rebuilt, batch)
      .orderBy("new_doc_id", "corpus_doc_id").collect().toSeq
    assert(after === ref, "delete must equal a rebuild over the survivors")
    assert(after !== before,
      "the deleted slice must contain matched corpus ids (non-vacuous fixture)")
    assert(after.nonEmpty)
    assert(after.forall(r => r.getLong(1) % 7 !== 1),
      "no taken-down document may surface as a match")
    // idempotent: the crash-heal path re-runs the same call
    IncrementalDedup.deleteFromStore(spark, store, ids)
    assert(IncrementalDedup.probeStore(spark, store, batch)
      .orderBy("new_doc_id", "corpus_doc_id").collect().toSeq === after)
  }

  test("delete rewrites only the affected shard leaves of both store tables") {
    def leafState(dir: String): Map[String, Set[(String, Long)]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      new java.io.File(dir).listFiles().filter(_.isDirectory).map { leaf =>
        leaf.getName -> walk(leaf)
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toSet
      }.toMap
    }
    val docs = Tables.documents(spark, sfDir)
    val store = Files.createTempDirectory("graft-incr-slice").toString
    IncrementalDedup.buildStore(docs.where(col("doc_id") % 5 =!= 0), store)
    val id = docs.where(col("doc_id") % 5 =!= 0).agg(min("doc_id"))
      .collect().head.getLong(0)
    val shard = java.lang.Math.floorMod(id, IncrementalDedup.DocShards.toLong)
    val sigBefore = leafState(IncrementalDedup.signaturesPath(store))
    val bukBefore = leafState(IncrementalDedup.bucketsPath(store))
    IncrementalDedup.deleteFromStore(spark, store, Seq(id))
    val sigAfter = leafState(IncrementalDedup.signaturesPath(store))
    val bukAfter = leafState(IncrementalDedup.bucketsPath(store))
    Seq((sigBefore, sigAfter, "signatures"), (bukBefore, bukAfter, "buckets"))
      .foreach { case (bef, aft, name) =>
        bef.keys.filterNot(_ == s"shard=$shard").foreach { leaf =>
          assert(aft(leaf) === bef(leaf),
            s"$name $leaf must be untouched by a delete in shard=$shard")
        }
        assert(aft(s"shard=$shard") !== bef(s"shard=$shard"),
          s"$name shard=$shard must be rewritten")
      }
    assert(spark.read.parquet(IncrementalDedup.signaturesPath(store))
      .where(col("doc_id") === id).count() === 0L,
      "the signature rows (derived personal data) must be gone")
    assert(spark.read.parquet(IncrementalDedup.bucketsPath(store))
      .where(col("doc_id") === id).count() === 0L)
  }

  test("shard fan-out is a recorded store parameter: a non-default " +
      "build probes identically and deletes the right leaves") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 === 1)
    val store = Files.createTempDirectory("graft-incr-fan").toString
    IncrementalDedup.buildStore(corpus, store, docShards = 4)
    assert(new java.io.File(IncrementalDedup.signaturesPath(store))
      .listFiles().count(_.getName.startsWith("shard=")) <= 4)
    val defStore = Files.createTempDirectory("graft-incr-fan32").toString
    IncrementalDedup.buildStore(corpus, defStore)
    val a = IncrementalDedup.probeStore(spark, store, batch)
    val b = IncrementalDedup.probeStore(spark, defStore, batch)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "fan-out must not change probe results")
    val id = corpus.select("doc_id").orderBy("doc_id").limit(1)
      .collect().head.getLong(0)
    IncrementalDedup.deleteFromStore(spark, store, Seq(id))
    assert(spark.read.parquet(IncrementalDedup.signaturesPath(store))
      .where(col("doc_id") === id).count() === 0L)
    assert(spark.read.parquet(IncrementalDedup.bucketsPath(store))
      .where(col("doc_id") === id).count() === 0L)
  }
}

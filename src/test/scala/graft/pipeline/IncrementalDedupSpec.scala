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
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.testkit.SparkTestSession

/** Plan-shape regression guards for the scale-critical physical properties
  * (PLANS.md): broadcasts stay broadcasts, single-scan queries stay
  * single-scan, and the knnIvf centroid argmax stays a partial aggregation
  * rather than a window over the corpus×centroids expansion. AQE is
  * disabled while inspecting (AdaptiveSparkPlanExec hides children until
  * execution).
  */
class PlanShapeSpec extends AnyFunSuite {
  // isolated SQLConf: this suite flips AQE off per plan probe, and other
  // concurrently-running suites must not see (or disturb) that
  private lazy val spark = SparkTestSession.isolated()
  // sf0.01, NOT the sf0.001 every functional suite uses: the CacheManager
  // is shared across sessions, and functional suites .cache() these exact
  // queries — at the same path the cached plan would be substituted
  // (InMemoryTableScan) and the scan/exchange assertions would probe the
  // wrong plan. A different path means a different plan, so no cache hit.
  // Plans are only built here, never executed, so the bigger sf is free.
  private val sfDir = "/root/testdata/sf0.01"

  private def plan(name: String): SparkPlan = {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  private def count[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Int =
    p.collect(pf).size

  test("q3/q5 join all dimensions via broadcast, scan each table once") {
    val q3 = plan("q3_top_orders")
    assert(count(q3) { case j: BroadcastHashJoinExec => j } === 2)
    assert(count(q3) { case j: SortMergeJoinExec => j } === 0)
    assert(count(q3) { case s: FileSourceScanExec => s } === 3)

    val q5 = plan("q5_nation_revenue")
    assert(count(q5) { case j: BroadcastHashJoinExec => j } === 5)
    assert(count(q5) { case j: SortMergeJoinExec => j } === 0)
  }

  test("text queries are single-scan") {
    for (q <- Seq("text_stats", "text_quality", "text_langid", "text_fingerprint",
        "text_token_count")) {
      assert(count(plan(q)) { case s: FileSourceScanExec => s } === 1, q)
    }
  }

  test("knnIvf assigns cells in a shuffle-free typed map; only the top-k ranks") {
    val p = plan("knn_ivf")
    // exactly ONE window: the final per-query top-k ranking. Cell
    // assignment is a typed map over the driver-held k×dim centroid set —
    // neither an aggregate nor a window; nothing corpus-sized may reach an
    // exchange before the top-k.
    assert(count(p) { case w: WindowExec => w } === 1,
      s"expected exactly the top-k window, got:\n$p")
    assert(!p.toString.contains("max_by"),
      "centroid assignment must not be an aggregation (typed map expected)")
    // the top-k window's hash exchange + the presentation sort's range
    // exchange — an extra one would mean assignment shuffled the corpus
    assert(count(p) { case e: ShuffleExchangeExec => e } <= 2,
      s"unexpected extra exchange:\n$p")
  }

  test("dedup_semantic's block join is EQUI-keyed on (cell, block), not cell alone") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    val p = plan("dedup_semantic")
    // the skew contract: the shuffle/join key must carry the block id —
    // with only `cell` as equi-key, a skewed cell's whole quadratic lands
    // on one task (the exact failure the blocking exists to prevent)
    val keyCounts = p.collect {
      case j: SortMergeJoinExec => j.leftKeys.length
      case j: ShuffledHashJoinExec => j.leftKeys.length
      case j: BroadcastHashJoinExec => j.leftKeys.length
    }
    assert(keyCounts.nonEmpty, s"expected a hash-joinable pair join:\n$p")
    assert(keyCounts.forall(_ >= 2),
      s"pair join must key on (cell, block), got $keyCounts key(s):\n$p")
  }

  test("knnPqAdc scores in one corpus pass; only the top-k window + sort exchange") {
    val p = plan("knn_pq_adc")
    // training/encode close over driver-held codebooks, so the FINAL plan
    // is: one corpus scan → typed flatMap (encode+score) → top-k window →
    // presentation sort. One scan, one window, ≤2 exchanges.
    assert(count(p) { case s: FileSourceScanExec => s } === 1,
      s"expected a single corpus scan:\n$p")
    assert(count(p) { case w: WindowExec => w } === 1,
      s"expected exactly the top-k window:\n$p")
    assert(count(p) { case e: ShuffleExchangeExec => e } <= 2,
      s"unexpected extra exchange:\n$p")
  }

  test("knnIvfPq search is one residual pass; only the top-k window + sort exchange") {
    val p = plan("knn_ivfpq")
    // index build (assignment, residuals, Lloyd rounds) runs as separate
    // driver-collected jobs; the SEARCH plan must stay: scan → typed
    // assignment/residual/encode/score maps → top-k window → sort
    assert(count(p) { case s: FileSourceScanExec => s } === 1,
      s"expected a single corpus scan:\n$p")
    assert(count(p) { case w: WindowExec => w } === 1,
      s"expected exactly the top-k window:\n$p")
    assert(count(p) { case e: ShuffleExchangeExec => e } <= 2,
      s"unexpected extra exchange:\n$p")
  }

  test("deletion probe is one grouped aggregate over a single scan") {
    val p = plan("del_affected_partitions")
    assert(count(p) { case s: FileSourceScanExec => s } === 1)
    // one exchange for the groupBy, one for the presentation sort
    assert(count(p) { case e: ShuffleExchangeExec => e } <= 2)
  }

  test("ann_ingest_matches pair join is EQUI-keyed on (cell, block), not cell alone") {
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    val p = plan("ann_ingest_matches")
    // the two-sided skew contract: the batch-vs-candidates join must carry
    // the corpus-side block id in its equi-key, or a pathological cell's
    // whole pair expansion lands on one reducer
    val keyCounts = p.collect {
      case j: SortMergeJoinExec if j.leftKeys.length >= 1 => j.leftKeys.length
      case j: ShuffledHashJoinExec => j.leftKeys.length
      case j: BroadcastHashJoinExec => j.leftKeys.length
    }
    assert(keyCounts.nonEmpty, s"expected a hash-joinable pair join:\n$p")
    assert(keyCounts.exists(_ >= 2),
      s"pair join must key on (cell, block), got $keyCounts key(s):\n$p")
  }

  test("substring spans: two-pass contract, span merge never a global window") {
    val p = plan("dedup_substring_spans")
    // the count-then-filter shape: one documents scan feeds the dup-hash
    // aggregate, one feeds the position re-join — never a third
    assert(count(p) { case s: FileSourceScanExec => s } === 2,
      s"expected exactly the two documents passes, got:\n$p")
    // both the lag/flag window and the cumulative-sum window partition by
    // doc_id — a SinglePartition window here would serialize the corpus
    val windows = p.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"span-merge window must partition by doc_id, got:\n$w"))
  }

  test("substring scrub adds only the per-doc cuts join to the span machinery") {
    val p = plan("dedup_substring_scrub")
    // dup aggregate pass + position pass + the clean-text rebuild scan
    assert(count(p) { case s: FileSourceScanExec => s } === 3,
      s"expected exactly three documents passes, got:\n$p")
    val windows = p.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"cut-merge window must partition by doc_id, got:\n$w"))
  }
}

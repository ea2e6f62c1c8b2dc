package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Curation must be exactly "quality survivors minus non-keeper dups" —
  * checked by accounting, not by re-running the same plan.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("kept count equals quality docs minus quality docs dropped as non-keeper dups") {
    val kept = Curation.curate(spark, sfDir).agg(sum("n_kept")).first().getLong(0)
    val quality = TextAnalysis.quality(spark, sfDir).where(col("is_quality"))
      .select("doc_id")
    val droppedQuality = Dedup.clusters(spark, sfDir)
      .where(col("doc_id") =!= col("cluster_id"))
      .join(quality, "doc_id").count()
    assert(kept === quality.count() - droppedQuality)
  }

  test("no kept language group is empty and averages are within the corpus range") {
    val out = Curation.curate(spark, sfDir).cache()
    assert(out.where(col("n_kept") <= 0).count() === 0)
    assert(out.where(col("avg_chars") < 1 || col("avg_chars") > 10000).count() === 0)
  }

  test("drop-list join gate: the no-broadcast path (scale mode) matches the broadcast path") {
    // broadcastMaxRows = -1 forces the unhinted join — the shape AQE picks
    // when the drop list outgrows the broadcast budget at 100 TB; results
    // must be identical either way
    val hinted = Curation.curate(spark, sfDir)
    val unhinted = Curation.curate(spark, sfDir, broadcastMaxRows = -1)
    assert(hinted.count() === unhinted.count())
    assert(hinted.except(unhinted).count() === 0)
    assert(unhinted.except(hinted).count() === 0)
  }

  test("curateFull keeps exactly the non-repetitive subset of curate's survivors") {
    // curateFull = curate's keep set further filtered by the repetition
    // flag — verified by accounting against the independent profile query
    val quality = TextAnalysis.quality(spark, sfDir).where(col("is_quality"))
      .select("doc_id")
    val nonRep = Repetition.repetition(spark, sfDir)
      .where(!col("is_repetitive")).select("doc_id")
    val dropped = Dedup.clusters(spark, sfDir)
      .where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val expected = quality.join(nonRep, "doc_id")
      .join(dropped, Seq("doc_id"), "left_anti").count()
    val kept = Curation.curateFull(spark, sfDir).agg(sum("n_kept")).first().getLong(0)
    assert(kept === expected)
  }

  test("curateFull on the PII-free corpus: zero PII docs, redaction is a no-op in aggregate") {
    val out = Curation.curateFull(spark, sfDir).cache()
    assert(out.where(col("n_kept") <= 0).count() === 0)
    assert(out.agg(sum("n_pii_docs")).first().getLong(0) === 0)
    // with no PII anywhere, redacted volume must equal the kept docs'
    // original text volume, recomputed independently per language
    val quality = TextAnalysis.quality(spark, sfDir).where(col("is_quality"))
      .select("doc_id")
    val nonRep = Repetition.repetition(spark, sfDir)
      .where(!col("is_repetitive")).select("doc_id")
    val dropped = Dedup.clusters(spark, sfDir)
      .where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val keptChars = graft.sources.Tables.documents(spark, sfDir)
      .join(quality, "doc_id").join(nonRep, "doc_id")
      .join(dropped, Seq("doc_id"), "left_anti")
      .groupBy("lang").agg(sum(length(col("text"))).as("orig_chars"))
    val mismatches = out.join(keptChars, "lang")
      .where(col("total_redacted_chars") =!= col("orig_chars")).count()
    assert(mismatches === 0)
  }

  test("curateFull plan: ONE documents scan, map-only filters, no sort-merge join") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = Curation.curateFull(s, sfDir).queryExecution.executedPlan
    val scans = plan.collect { case sc: FileSourceScanExec => sc }
    assert(scans.size === 1,
      s"quality+repetition+PII must all ride the single documents scan:\n$plan")
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"the drop-list anti-join must broadcast at this scale:\n$plan")
  }

  test("curation plan: ONE documents scan, inline quality filter, no sort-merge join") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // isolated session + AQE off so the physical shape is statically visible
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = Curation.curate(s, sfDir).queryExecution.executedPlan
    val scans = plan.collect { case sc: FileSourceScanExec => sc }
    assert(scans.size === 1, s"quality must filter the single documents scan:\n$plan")
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"the drop-list anti-join must broadcast, not sort-merge:\n$plan")
  }
}

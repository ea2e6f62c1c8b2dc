package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

class ImportanceSamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("selection is enriched in target-distribution documents vs the base rate") {
    val docs = Tables.documents(spark, sfDir)
    val isTarget = col("lang") === "en" && col("doc_id") % 5 === 0
    val baseRate = docs.filter(isTarget).count().toDouble / docs.count()
    val selected = ImportanceSampling.importanceTopK(spark, sfDir)
      .join(docs.select(col("doc_id"), isTarget.as("t")), "doc_id")
    val selRate = selected.filter(col("t")).count().toDouble / selected.count()
    // the whole point of DSIR: the importance-weighted selection should
    // pull the curated slice in well above its prevalence
    assert(selRate > 2 * baseRate,
      s"selected target rate $selRate not enriched over base rate $baseRate")
  }

  test("deterministic: two runs produce the identical selected set") {
    val a = ImportanceSampling.importanceTopK(spark, sfDir).collect().toSeq
    val b = ImportanceSampling.importanceTopK(spark, sfDir).collect().toSeq
    assert(a === b)
    assert(a.size === ImportanceSampling.TopK)
  }

  test("plan: weights join broadcasts and selection is a top-k, not a global sort") {
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = ImportanceSampling.importanceTopK(s, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"bucket-weight join must broadcast the parameter-sized weight table:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k selection must be TakeOrderedAndProject, not a global Sort+Limit:\n$plan")
  }
}

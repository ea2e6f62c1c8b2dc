package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Snapshot diff: the status partition matches first-principles set
  * arithmetic on the fixture derivation, and all four statuses occur.
  */
class CorpusDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("status counts match the fixture's set arithmetic; every status present") {
    val ids = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val oldIds = ids.filter(_ % 10 != 0).toSet
    val newIds = ids.filter(_ % 13 != 0).toSet
    val want = Map(
      "added" -> (newIds -- oldIds).size.toLong,
      "removed" -> (oldIds -- newIds).size.toLong,
      "changed" -> (oldIds & newIds).count(_ % 7 == 0).toLong,
      "unchanged" -> (oldIds & newIds).count(_ % 7 != 0).toLong)
    val got = CorpusDiff.diff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(want.values.forall(_ > 0), "fixture must exercise all four statuses")
    assert(got.values.sum === (newIds ++ oldIds).size.toLong,
      "every doc in either snapshot is classified exactly once")
  }
}

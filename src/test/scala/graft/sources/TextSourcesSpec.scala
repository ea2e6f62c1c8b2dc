package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** CSV / JSON-lines sources round-trip with declared schemas and fail
  * fast on corrupt input instead of nulling it.
  */
class TextSourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val nationOriginal =
    Tables.nation(spark, sfDir).select("n_nationkey", "n_name", "n_regionkey")

  test("CSV round-trip preserves rows and types under the declared schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    nationOriginal.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Tables.csv(spark, dir, nationOriginal.schema)
    assert(back.schema === nationOriginal.schema)
    assert(back.exceptAll(nationOriginal).count() === 0)
    assert(nationOriginal.exceptAll(back).count() === 0)
  }

  test("JSON-lines round-trip preserves rows under the declared schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    nationOriginal.write.mode("overwrite").json(dir)
    val back = Tables.jsonLines(spark, dir, nationOriginal.schema)
    assert(back.exceptAll(nationOriginal).count() === 0)
    assert(nationOriginal.exceptAll(back).count() === 0)
  }

  test("FAILFAST surfaces corrupt records instead of silently nulling them") {
    val dir = Files.createTempDirectory("graft-bad").toString
    Files.writeString(java.nio.file.Paths.get(dir, "bad.json"),
      """{"n_nationkey": "not-a-number", "n_name": "X", "n_regionkey": 0}""")
    val ex = intercept[Exception] {
      // count() alone skips value parsing (Spark's JSON count optimization
      // only checks record structure) — materialize a field to force it
      Tables.jsonLines(spark, dir, nationOriginal.schema)
        .select("n_nationkey").collect()
    }
    assert(ex.getMessage != null)
  }

  test("declared schema lets the CSV scan prune to the selected columns") {
    val dir = Files.createTempDirectory("graft-prune").toString
    nationOriginal.write.mode("overwrite").option("header", "true").csv(dir)
    val plan = Tables.csv(spark, dir, nationOriginal.schema)
      .select("n_name").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<n_name:string>"),
      s"expected pruned ReadSchema in:\n$plan")
  }
}

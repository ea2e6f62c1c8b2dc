package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** The range layout must actually deliver its pruning contract: disjoint
  * per-file value ranges, a pushed filter on read, and unchanged data.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("each written file covers a disjoint doc_id range") {
    val out = java.nio.file.Files.createTempDirectory("graft-layout").toString
    Layout.writeRangeLayout(Tables.documents(spark, sfDir), out, "doc_id", 8)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 2, "range write must spread across files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi < lo, s"file ranges overlap: max $hi >= next min $lo")
      case _ => ()
    }
  }

  test("a selective read pushes the predicate into the parquet scan, data intact") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val out = java.nio.file.Files.createTempDirectory("graft-layout2").toString
    val docs = Tables.documents(spark, sfDir)
    Layout.writeRangeLayout(docs, out, "doc_id", 8)
    val read = spark.read.parquet(out).where(col("doc_id").between(100, 120))
    val scan = read.queryExecution.executedPlan
      .collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(doc_id,100)"),
      s"filter must reach the parquet reader: ${scan.metadata("PushedFilters")}")
    // round-trip equality on the selected range
    val expected = docs.where(col("doc_id").between(100, 120))
    assert(read.count() === expected.count())
    assert(read.select("doc_id").except(expected.select("doc_id")).count() === 0)
  }
}

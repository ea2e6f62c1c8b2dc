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

  test("z-order layout prunes on BOTH columns; round-trip intact") {
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_quantity")
    Layout.writeZOrderLayout(li, out, "l_orderkey", "l_partkey", 16)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 8, "z-order write must spread across files")
    // per-file bounding boxes in the (orderkey, partkey) plane — what
    // parquet footer min/max stats expose to the scan planner
    val boxes = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey"), min("l_partkey"), max("l_partkey"))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // a narrow slice on EITHER dimension must skip most files — the
    // property a single-column range sort only provides for its own column
    val (okLo, okHi, pkLo, pkHi) = (
      boxes.map(_._1).min, boxes.map(_._2).max,
      boxes.map(_._3).min, boxes.map(_._4).max)
    val okProbe = (okLo + okHi) / 2
    val pkProbe = (pkLo + pkHi) / 2
    val okHits = boxes.count { case (lo, hi, _, _) => lo <= okProbe && okProbe <= hi }
    val pkHits = boxes.count { case (_, _, lo, hi) => lo <= pkProbe && pkProbe <= hi }
    assert(okHits <= files.length / 2,
      s"orderkey probe hits $okHits of ${files.length} file boxes")
    assert(pkHits <= files.length / 2,
      s"partkey probe hits $pkHits of ${files.length} file boxes")
    // round-trip: no rows gained or lost
    val back = spark.read.parquet(out)
    assert(back.count() === li.count())
    assert(back.except(li).count() === 0 && li.except(back).count() === 0)
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

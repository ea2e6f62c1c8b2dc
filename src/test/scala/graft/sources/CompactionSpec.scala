package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Compaction contract: far fewer files out than in, no row lost or
  * duplicated, and — the scale property — NO shuffle anywhere in the
  * rewrite plan (coalesce is a narrow dependency).
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("compaction shrinks file count, preserves rows, and never shuffles") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val (smallDir, outDir) = (s"$base/small", s"$base/out")
    val docs = Tables.documents(spark, sfDir)
    docs.repartition(64).write.parquet(smallDir)

    val (nIn, totalBytes, nOut) = Compaction.plan(spark, smallDir, 512 * 1024L)
    assert(nIn === 64)
    assert(nOut === math.max(1, math.ceil(totalBytes / (512 * 1024.0)).toInt))
    assert(nOut < nIn, "target must be coarser than the small-file mess")

    val (_, written) = Compaction.compact(spark, smallDir, outDir, 512 * 1024L)
    assert(written === nOut, s"expected $nOut output files, found $written")

    // row fidelity both ways
    val back = spark.read.parquet(outDir)
    assert(back.count() === docs.count())
    assert(back.except(docs).count() === 0 && docs.except(back).count() === 0)

    // the scale property: the rewrite plan contains no exchange
    val rewritePlan = spark.read.parquet(smallDir).coalesce(nOut)
      .queryExecution.executedPlan
    assert(rewritePlan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      "compaction must be a narrow (shuffle-free) rewrite")
  }

  test("split-up direction: more planned files than input splits still writes the planned count") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-split").toString
    val (bigDir, outDir) = (s"$base/big", s"$base/out")
    val docs = Tables.documents(spark, sfDir)
    // one big file; a tiny targetBytes forces nOut > the scan's splits
    docs.coalesce(1).write.parquet(bigDir)
    val (nIn, totalBytes, nOut) = Compaction.plan(spark, bigDir, 16 * 1024L)
    assert(nIn === 1)
    assert(nOut > 1, s"fixture must demand a split ($totalBytes bytes / 16KiB)")
    val (_, written) = Compaction.compact(spark, bigDir, outDir, 16 * 1024L)
    assert(written === nOut,
      s"split-up must honor the plan via the repartition fallback: $written != $nOut")
    val back = spark.read.parquet(outDir)
    assert(back.count() === docs.count())
    assert(back.except(docs).count() === 0 && docs.except(back).count() === 0)
  }

  test("a partitioned root fails loudly instead of collapsing partitions to one file") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-part").toString
    Tables.documents(spark, sfDir).write.partitionBy("lang").parquet(s"$base/t")
    val e = intercept[IllegalArgumentException] {
      Compaction.plan(spark, s"$base/t", 512 * 1024L)
    }
    assert(e.getMessage.contains("leaf partition directory"))
  }
}

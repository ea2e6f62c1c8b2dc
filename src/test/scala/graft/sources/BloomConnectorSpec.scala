package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Bloom skipping inside the connector's FileIndex: an attached
  * `_bloom/<col>.json` sidecar prunes files on equality predicates the
  * min/max ladder cannot touch (decorrelated keys span every file's
  * range), rows stay exactly right, and a stale sidecar can only lose
  * pruning — never rows.
  */
class BloomConnectorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  /** Ten partitions, one file each; `uid = xxhash64(id)` decorrelates
    * the lookup key from the layout so min/max never prunes it.
    */
  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-bloomconn").toString
    val df = spark.range(1000).select(col("id"),
      xxhash64(col("id")).as("uid"),
      concat(lit("p"), (col("id") % 10).cast("string")).as("p"))
    VersionedTable.create(df, dir, "p")
    dir
  }
  private def load(dir: String): DataFrame =
    spark.read.format("graft-snapshot").load(dir)

  private def filesPlanned(df: => DataFrame): (Seq[Long], Long) = {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val frame = df
      val rows = frame.collect().map(_.getAs[Long]("id")).sorted.toSeq
      val scans = frame.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.size === 1)
      (rows, scans.head.metrics("numFiles").value)
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("an attached bloom prunes files on a decorrelated equality key") {
    val dir = mkTable()
    val uid7 = spark.range(1000).select(xxhash64(col("id")))
      .collect()(7).getLong(0)
    // before attach: the key spans every file's [min,max] — all 10 scan
    val (rows0, files0) = filesPlanned(load(dir).filter($"uid" === uid7))
    assert(rows0 === Seq(7L) && files0 === 10)
    BloomSkipIndex.attach(spark, dir, "uid")
    // a NEW relation picks the sidecar up: same rows, fewer files
    val (rows1, files1) = filesPlanned(load(dir).filter($"uid" === uid7))
    assert(rows1 === Seq(7L), "bloom pruning must never lose the row")
    assert(files1 < 10, s"expected bloom pruning, planned $files1 files")
    // IN-lists prune too (union of probes)
    val uid3 = spark.range(1000).select(xxhash64(col("id")))
      .collect()(3).getLong(0)
    val (rowsIn, filesIn) =
      filesPlanned(load(dir).filter($"uid".isin(uid7, uid3)))
    assert(rowsIn === Seq(3L, 7L) && filesIn < 10)
  }

  test("a stale sidecar keeps unindexed files: appends stay findable") {
    val dir = mkTable()
    BloomSkipIndex.attach(spark, dir, "uid")
    // append AFTER the attach: the new file has no sidecar entry
    VersionedTable.append(
      Seq((5000L, 424242L, "p0")).toDF("id", "uid", "p"), dir, "p")
    val found = load(dir).filter($"uid" === 424242L)
      .select("id").as[Long].collect().toSeq
    assert(found === Seq(5000L),
      "a stale bloom sidecar must keep files it has no entry for")
    // and after a refresh the new key becomes prunable evidence too
    BloomSkipIndex.attach(spark, dir, "uid")
    val (rows, files) = filesPlanned(load(dir).filter($"uid" === 424242L))
    assert(rows === Seq(5000L) && files < 11)
  }

  test("non-equality predicates ignore the bloom entirely") {
    val dir = mkTable()
    BloomSkipIndex.attach(spark, dir, "uid")
    val n = load(dir).filter($"uid" > 0L).count()
    val expected = spark.range(1000)
      .select(xxhash64(col("id")).as("u")).filter($"u" > 0L).count()
    assert(n === expected)
  }
}

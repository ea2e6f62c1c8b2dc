package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** ORC through the snapshot stack — the reference engine is ORC-native
  * (`SparkSessionManager` pins `spark.sql.orc.*`), so the versioned
  * table must commit, read, skip and delete ORC leaves first-class:
  * `create(format = "orc")` records the format in the manifest, the
  * footer harvest reads ORC file statistics into the same `_stats.tsv`
  * sidecars, and every downstream consumer (connector relation, file
  * skipping, zero-listing builds, COW delete, time travel) runs off the
  * recorded format. Unsupported formats refuse loudly at create.
  */
class OrcSnapshotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  private def fixture() = Seq(
    (1L, "a", "2024-01-01", 10L), (2L, "b", "2024-01-01", 20L),
    (3L, "a", "2024-01-02", 30L), (4L, "b", "2024-01-02", 40L),
    (5L, "a", "2024-01-03", 50L), (6L, "a", "2024-01-03", 60L)
  ).toDF("id", "kind", "pdate", "amount")

  private def makeOrcTable(): String = {
    val dir = Files.createTempDirectory("graft-orc").toString
    VersionedTable.create(fixture().filter($"id" <= 4), dir, "pdate",
      format = "orc")
    VersionedTable.append(fixture().filter($"id" > 4), dir, "pdate")
    dir
  }

  private def load(dir: String): DataFrame =
    spark.read.format("graft-snapshot").load(dir)

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  private def runCounting(df: => DataFrame): (Seq[Long], Long) = {
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

  test("ORC round-trip: create, append, connector + library reads agree") {
    val dir = makeOrcTable()
    // physical files are genuinely ORC
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val dataFiles = walk(new java.io.File(s"$dir/data"))
      .filter(f => FileStats.isDataFile(f.getName))
    assert(dataFiles.nonEmpty)
    assert(dataFiles.forall(_.getName.endsWith(".orc")),
      s"expected .orc leaves, got ${dataFiles.map(_.getName)}")
    assert(ids(load(dir)) === (1L to 6L))
    assert(ids(VersionedTable.readLatest(spark, dir)) === (1L to 6L))
    // time travel
    assert(ids(spark.read.format("graft-snapshot")
      .option("versionAsOf", "0").load(dir)) === (1L to 4L))
  }

  test("ORC file statistics skip whole files; zero-listing builds hold") {
    val dir = Files.createTempDirectory("graft-orc-skip").toString
    // two commits into the SAME partition: only per-file stats separate them
    VersionedTable.create(
      Seq((1L, "a", "2024-01-01", 10L), (2L, "b", "2024-01-01", 20L))
        .toDF("id", "kind", "pdate", "amount"), dir, "pdate", format = "orc")
    VersionedTable.append(
      Seq((3L, "c", "2024-01-01", 100L), (4L, "d", "2024-01-01", 200L))
        .toDF("id", "kind", "pdate", "amount"), dir, "pdate")
    val (all, allFiles) = runCounting(load(dir))
    assert(all === Seq(1L, 2L, 3L, 4L))
    assert(allFiles === 2)
    // integral range skip from ORC stats
    val (hi, hiFiles) = runCounting(load(dir).filter($"amount" > 50L))
    assert(hi === Seq(3L, 4L))
    assert(hiFiles === 1, "ORC min/max must skip the low-range file")
    // string skip (ORC string statistics)
    val (str, strFiles) = runCounting(load(dir).filter($"kind" >= "c"))
    assert(str === Seq(3L, 4L))
    assert(strFiles === 1)
    // zero-listing relation build on the ORC table
    val idx = load(dir).queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.asInstanceOf[ManifestFileIndex]
    }.head
    assert(idx.leafListings === 0L,
      "_files.tsv rides ORC commits too — builds must not list")
    // metadata-only count rewrite fires off ORC-harvested sidecars
    val n = load(dir).agg(count(lit(1)).as("n"))
    assert(!n.queryExecution.executedPlan.toString.contains("FileScan"))
    assert(n.collect().head.getLong(0) === 4L)
  }

  test("COW delete and compact on an ORC table; survivors stay ORC") {
    val dir = makeOrcTable()
    VersionedTable.delete(spark, dir, "pdate", $"kind" === "a" && $"id" < 5L)
    assert(ids(load(dir)) === Seq(2L, 4L, 5L, 6L))
    VersionedTable.compact(spark, dir, "pdate")
    assert(ids(load(dir)) === Seq(2L, 4L, 5L, 6L))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val head = VersionedTable.liveDataFiles(spark, dir)
    assert(head.nonEmpty && head.forall(_.endsWith(".orc")),
      "rewrites must keep the table's recorded format")
  }

  test("merge-on-read delete refuses on ORC: no _metadata.row_index to anchor on") {
    val dir = makeOrcTable()
    val headBefore = VersionedTable.latestVersion(spark, dir)
    // Spark's ORC reader exposes no _metadata.row_index — a position
    // vector would be silently mis-anchored, so the refusal is loud and
    // the table untouched; COW delete remains the ORC deletion path
    val e = intercept[IllegalArgumentException] {
      VersionedTable.deleteMergeOnRead(spark, dir, $"id" === 3L)
    }
    assert(e.getMessage.contains("row_index"))
    assert(VersionedTable.latestVersion(spark, dir) === headBefore)
    assert(ids(load(dir)) === (1L to 6L))
  }

  test("bloom skip index builds, refreshes and looks up over ORC leaves") {
    val dir = makeOrcTable()
    val idxPath = s"$dir/bloom_orc.json"
    val (fresh0, kept0, dropped0) =
      BloomSkipIndex.refresh(spark, dir, "id", idxPath)
    assert(fresh0 > 0 && kept0 === 0 && dropped0 === 0)
    val (rows, scanned, total) =
      BloomSkipIndex.lookupFresh(spark, dir, idxPath, "id", Seq(5L))
    assert(rows.select("id").as[Long].collect().toSeq === Seq(5L))
    assert(scanned < total, "bloom must prune ORC files too")
    // append -> refresh indexes only the new ORC files
    VersionedTable.append(Seq((7L, "c", "2024-01-04", 70L))
      .toDF("id", "kind", "pdate", "amount"), dir, "pdate")
    val (fresh1, kept1, _) = BloomSkipIndex.refresh(spark, dir, "id", idxPath)
    assert(fresh1 >= 1 && kept1 === fresh0)
    val (rows1, _, _) =
      BloomSkipIndex.lookupFresh(spark, dir, idxPath, "id", Seq(7L))
    assert(rows1.select("id").as[Long].collect().toSeq === Seq(7L))
  }

  test("convertFormat migrates ORC -> parquet; history reads both sides of the boundary") {
    val dir = makeOrcTable()
    val preVersion = VersionedTable.latestVersion(spark, dir)
    VersionedTable.convertFormat(spark, dir, "pdate", "parquet")
    // head is parquet now: rows identical, MOR deletes become available
    assert(ids(load(dir)) === (1L to 6L))
    val head = VersionedTable.liveDataFiles(spark, dir)
    assert(head.nonEmpty && head.forall(_.endsWith(".parquet")))
    VersionedTable.deleteMergeOnRead(spark, dir, $"id" === 2L)
    assert(ids(load(dir)) === Seq(1L, 3L, 4L, 5L, 6L))
    // time travel BEHIND the migration still reads the ORC leaves
    assert(ids(spark.read.format("graft-snapshot")
      .option("versionAsOf", preVersion.toString).load(dir)) === (1L to 6L))
    // file skipping works on the migrated (parquet-harvested) sidecars
    val (hi, hiFiles) = runCounting(spark.read.format("graft-snapshot")
      .option("versionAsOf", (preVersion + 1).toString).load(dir)
      .filter($"amount" >= 50L))
    assert(hi === Seq(5L, 6L))
    val (_, allF) = runCounting(spark.read.format("graft-snapshot")
      .option("versionAsOf", (preVersion + 1).toString).load(dir))
    assert(hiFiles < allF)
  }

  test("optimizeZOrder on ORC: content identical, leaves stay .orc, " +
      "file skipping holds on both z-dimensions") {
    val dir = makeOrcTable()
    val before = VersionedTable.readLatest(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    // stripe-sized ORC (orc.stripe.size is the intra-file skipping
    // granularity, parquet.block.size's ORC analogue); several slices so
    // the per-file min/max stats have something to separate
    VersionedTable.optimizeZOrder(spark, dir, "pdate", "id", "amount",
      rowGroupBytes = 1 << 18, numSlices = 4)
    val after = VersionedTable.readLatest(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after === before)
    assert(VersionedTable.liveDataFiles(spark, dir).forall(_.endsWith(".orc")),
      "z-order must preserve the table's recorded format")
    // an above-max predicate still skips files via the harvested ORC
    // file statistics
    val (rows, files) = runCounting(load(dir).filter($"amount" > lit(60L)))
    assert(rows.isEmpty)
    val (_, allFiles) = runCounting(load(dir).filter(lit(true)))
    assert(files < allFiles,
      s"expected ORC file skipping after z-order ($files vs $allFiles)")
  }

  test("unsupported formats refuse loudly at create") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    val e = intercept[IllegalArgumentException] {
      VersionedTable.create(fixture(), dir, "pdate", format = "csv")
    }
    assert(e.getMessage.contains("unsupported versioned-table format"))
    assert(VersionedTable.versions(spark, dir).isEmpty,
      "a refused create must not leave a half-made table")
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Contracts of the read-only maintenance surfaces: the VACUUM dry run
  * must report exactly what the real sweep then reclaims (and nothing
  * after it), and DESCRIBE DETAIL must summarize the head manifest's
  * actual footprint.
  */
class MaintenanceOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture() = Seq(
    (1L, "a", "2024-01-01", 10L), (2L, "b", "2024-01-01", 20L),
    (3L, "a", "2024-01-02", 30L), (4L, "b", "2024-01-02", 40L),
    (5L, "a", "2024-01-03", 50L), (6L, "a", "2024-01-03", 60L)
  ).toDF("id", "kind", "pdate", "amount")

  private def fs() = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("vacuumDryRun reports exactly what vacuum reclaims, then goes quiet") {
    val dir = Files.createTempDirectory("graft-dry").toString
    val df = fixture()
    VersionedTable.create(df.filter($"id" <= 4), dir, "pdate")
    VersionedTable.append(df.filter($"id" > 4), dir, "pdate")
    VersionedTable.delete(spark, dir, "pdate", $"pdate" === "2024-01-01")
    val (dead, dropVers, orphans) =
      VersionedTable.vacuumDryRun(spark, dir, retainLast = 1, orphanGraceMs = 0L)
    assert(dropVers === Seq(0, 1))
    // v2 carries v0/v1's untouched leaves by reference; only the
    // rewritten partition's old leaf plus nothing else is dead
    assert(dead === Seq("data/" +
      new Path(VersionedTable.physicalDataDir(spark, dir, 0)).getName +
      "/pdate__p=2024-01-01"))
    // the whole partition died, so v2's rewrite dir holds no leaves and
    // is referenced by nothing — the orphan rule owns it
    assert(orphans.size === 1 && orphans.head.startsWith("data/add-v2-"))
    val f = fs()
    dead.foreach(l => assert(f.exists(new Path(s"$dir/$l")), s"predicted dead $l missing"))
    VersionedTable.vacuum(spark, dir, retainLast = 1, orphanGraceMs = 0L)
    dead.foreach(l => assert(!f.exists(new Path(s"$dir/$l")), s"vacuum left $l"))
    assert(VersionedTable.readLatest(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq === Seq(3L, 4L, 5L, 6L))
    val (dead2, drop2, orph2) =
      VersionedTable.vacuumDryRun(spark, dir, retainLast = 1, orphanGraceMs = 0L)
    assert(dead2.isEmpty && drop2.isEmpty && orph2.isEmpty)
  }

  test("vacuumDryRun surfaces an aged crashed-writer orphan dir") {
    val dir = Files.createTempDirectory("graft-dry-orphan").toString
    VersionedTable.create(fixture(), dir, "pdate")
    val f = fs()
    // a staged dir a writer abandoned before committing: version-named,
    // referenced by no manifest
    val stale = new Path(s"$dir/data/add-v0-deadbeef")
    val young = new Path(s"$dir/data/add-v0-young")
    f.mkdirs(stale)
    f.setTimes(stale, 1000L, 1000L)
    f.mkdirs(young)
    val (dead, dropVers, orphans) =
      VersionedTable.vacuumDryRun(spark, dir, retainLast = 1, orphanGraceMs = 0L)
    assert(dead.isEmpty && dropVers.isEmpty)
    assert(orphans === Seq("data/add-v0-deadbeef", "data/add-v0-young"))
    // a YOUNG unreferenced dir (possibly a commit in flight) is protected
    // by the grace period in the dry run exactly as in the sweep
    val (_, _, orphGrace) =
      VersionedTable.vacuumDryRun(spark, dir, retainLast = 1)
    assert(orphGrace === Seq("data/add-v0-deadbeef"))
    VersionedTable.vacuum(spark, dir, retainLast = 1, orphanGraceMs = 0L)
    assert(!f.exists(stale) && !f.exists(young))
  }

  test("describeDetail summarizes the head's actual footprint") {
    val dir = Files.createTempDirectory("graft-detail").toString
    val df = fixture()
    VersionedTable.create(df.filter($"id" <= 4), dir, "pdate")
    VersionedTable.append(df.filter($"id" > 4), dir, "pdate")
    VersionedTable.deleteMergeOnRead(spark, dir, $"kind" === "b")
    val row = VersionedTable.describeDetail(spark, dir).collect().head
    assert(row.getAs[String]("location") === dir)
    assert(row.getAs[Int]("version") === 2)
    assert(row.getAs[Int]("num_versions") === 3)
    assert(row.getAs[Int]("num_leaves") === 3)
    val f = fs()
    val realFiles = VersionedTable.liveDataFiles(spark, dir)
    assert(row.getAs[Long]("num_files") === realFiles.size.toLong)
    assert(row.getAs[Long]("size_bytes") ===
      realFiles.map(p => f.getFileStatus(new Path(p)).getLen).sum)
    assert(row.getAs[Int]("num_delete_dirs") === 1)
    assert(row.getAs[Int]("num_dirty_leaves") >= 1)
    assert(row.getAs[String]("partition_spec") === "pdate")
    assert(row.getAs[String]("schema_ddl").contains("id BIGINT"))
    assert(row.getAs[Int]("num_txn_channels") === 0)
  }
}

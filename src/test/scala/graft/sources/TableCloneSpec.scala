package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Contracts of the zero-copy clone and the metadata-only count:
  * link-not-copy on local FS, total divergence after the clone commit,
  * vacuum-on-either-side safety (the refcounted-inode argument), and
  * count(*)-from-sidecars exactness including pending-delete-vector
  * subtraction and its dedup.
  */
class TableCloneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture() = Seq(
    (1L, "a", "2024-01-01", 10L), (2L, "b", "2024-01-01", 20L),
    (3L, "a", "2024-01-02", 30L), (4L, "b", "2024-01-02", 40L),
    (5L, "a", "2024-01-03", 50L), (6L, "a", "2024-01-03", 60L)
  ).toDF("id", "kind", "pdate", "amount")

  private def ids(dir: String): Seq[Long] =
    VersionedTable.readLatest(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("clone links every file (zero copies) and reads the exact head state") {
    val src = tmp("graft-clone-src")
    val dst = tmp("graft-clone-dst")
    val df = fixture()
    VersionedTable.create(df.filter($"id" <= 4), src, "pdate")
    VersionedTable.append(df.filter($"id" > 4), src, "pdate")
    val (linked, copied) = VersionedTable.cloneTable(spark, src, dst)
    assert(copied === 0L, "local FS clone must hardlink, not copy")
    assert(linked > 0L)
    assert(ids(dst) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // linked = same inode, not an equal-bytes copy
    val srcFiles = VersionedTable.liveDataFiles(spark, src)
    val dstFiles = VersionedTable.liveDataFiles(spark, dst)
    assert(srcFiles.size === dstFiles.size)
    srcFiles.zip(dstFiles).foreach { case (s, d) =>
      assert(Files.isSameFile(Paths.get(s), Paths.get(d)),
        s"$d is not a hardlink of $s")
    }
  }

  test("a MOR table clones with its pending vectors applied") {
    val src = tmp("graft-clone-mor-src")
    val dst = tmp("graft-clone-mor-dst")
    VersionedTable.create(fixture(), src, "pdate")
    VersionedTable.deleteMergeOnRead(spark, src, $"kind" === "b")
    VersionedTable.cloneTable(spark, src, dst)
    assert(ids(dst) === Seq(1L, 3L, 5L, 6L))
    // and the clone's own compact folds them without touching the source
    VersionedTable.compact(spark, dst, "pdate")
    assert(ids(dst) === Seq(1L, 3L, 5L, 6L))
    assert(ids(src) === Seq(1L, 3L, 5L, 6L))
  }

  test("divergence is total: mutations on one side never leak to the other") {
    val src = tmp("graft-div-src")
    val dst = tmp("graft-div-dst")
    VersionedTable.create(fixture(), src, "pdate")
    VersionedTable.cloneTable(spark, src, dst)
    VersionedTable.delete(spark, src, "pdate", $"pdate" === "2024-01-01")
    assert(ids(src) === Seq(3L, 4L, 5L, 6L))
    assert(ids(dst) === Seq(1L, 2L, 3L, 4L, 5L, 6L), "source delete leaked into clone")
    VersionedTable.append(
      Seq((7L, "c", "2024-01-04", 70L)).toDF("id", "kind", "pdate", "amount"),
      dst, "pdate")
    assert(ids(dst) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(ids(src) === Seq(3L, 4L, 5L, 6L), "clone append leaked into source")
  }

  test("vacuum on the source cannot break the clone (refcounted links)") {
    val src = tmp("graft-vac-src")
    val dst = tmp("graft-vac-dst")
    VersionedTable.create(fixture(), src, "pdate")
    VersionedTable.cloneTable(spark, src, dst)
    // rewrite every source partition, then vacuum to the head alone: the
    // clone's linked files lose their SOURCE directory entries but keep
    // their inodes through the clone's links
    VersionedTable.delete(spark, src, "pdate", $"id" === 1L)
    VersionedTable.compact(spark, src, "pdate")
    VersionedTable.vacuum(spark, src, retainLast = 1, orphanGraceMs = 0L)
    assert(ids(src) === Seq(2L, 3L, 4L, 5L, 6L))
    assert(ids(dst) === Seq(1L, 2L, 3L, 4L, 5L, 6L),
      "source vacuum broke the clone — the zero-copy design's core promise")
    // and the mirror direction: vacuuming the clone leaves the source whole
    VersionedTable.delete(spark, dst, "pdate", $"id" === 6L)
    VersionedTable.compact(spark, dst, "pdate")
    VersionedTable.vacuum(spark, dst, retainLast = 1, orphanGraceMs = 0L)
    assert(ids(src) === Seq(2L, 3L, 4L, 5L, 6L))
    assert(ids(dst) === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("clone refuses an existing table as destination") {
    val src = tmp("graft-ref-src")
    val dst = tmp("graft-ref-dst")
    VersionedTable.create(fixture(), src, "pdate")
    VersionedTable.create(fixture(), dst, "pdate")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.cloneTable(spark, src, dst)
    }
    assert(e.getMessage.contains("already a table"))
  }

  test("countMeta matches a real count at every lifecycle stage") {
    val dir = tmp("graft-meta")
    val df = fixture()
    def real(): Map[String, Long] =
      VersionedTable.readLatest(spark, dir).groupBy("pdate").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    VersionedTable.create(df.filter($"id" <= 4), dir, "pdate")
    assert(VersionedTable.countMeta(spark, dir).toMap === real())
    VersionedTable.append(df.filter($"id" > 4), dir, "pdate")
    assert(VersionedTable.countMeta(spark, dir).toMap === real())
    // pending vectors subtract per dirty file
    VersionedTable.deleteMergeOnRead(spark, dir, $"kind" === "b")
    assert(VersionedTable.countMeta(spark, dir).toMap === real())
    // re-deleting the same rows writes overlapping vector entries — the
    // DISTINCT (file,pos) fold must not double-subtract
    VersionedTable.deleteMergeOnRead(spark, dir, $"kind" === "b" || $"id" === 1L)
    assert(VersionedTable.countMeta(spark, dir).toMap === real())
    // compact folds vectors; counts come from fresh sidecars again
    VersionedTable.compact(spark, dir, "pdate")
    assert(VersionedTable.countMeta(spark, dir).toMap === real())
    assert(real() === Map("2024-01-02" -> 1L, "2024-01-03" -> 2L))
  }

  test("boundsMeta matches real min/max/nulls, including an all-null column") {
    val dir = tmp("graft-bounds")
    val df = Seq(
      (1L, Some("bb"), Some(1.5), "2024-01-01"),
      (2L, Some("aa"), None, "2024-01-01"),
      (3L, None, Some(-2.25), "2024-01-02"),
      (4L, Some("cc"), Some(9.75), "2024-01-02")
    ).toDF("id", "name", "score", "pdate")
      .withColumn("void", lit(null).cast("string"))
    VersionedTable.create(df.filter($"id" <= 2), dir, "pdate")
    VersionedTable.append(df.filter($"id" > 2), dir, "pdate")
    val b = VersionedTable.boundsMeta(spark, dir,
      Seq("id", "name", "score", "void")).map {
        case (c, mn, mx, n) => c -> ((mn, mx, n)) }.toMap
    assert(b("id") === ((Some("1"), Some("4"), 0L)))
    assert(b("name") === ((Some("aa"), Some("cc"), 1L)))
    val (smn, smx, snulls) = b("score")
    assert(smn.get.toDouble === -2.25)
    assert(smx.get.toDouble === 9.75)
    assert(snulls === 1L)
    assert(b("void") === ((None, None, 4L)))
  }

  test("boundsMeta refuses pending delete vectors and unknown columns") {
    val dir = tmp("graft-bounds-refuse")
    VersionedTable.create(fixture(), dir, "pdate")
    intercept[IllegalArgumentException] {
      VersionedTable.boundsMeta(spark, dir, Seq("nope"))
    }
    VersionedTable.deleteMergeOnRead(spark, dir, $"kind" === "b")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.boundsMeta(spark, dir, Seq("id"))
    }
    assert(e.getMessage.contains("compact first"))
    // compact folds the vectors; bounds are sound again and reflect the
    // delete (id 2 and 4 gone, but extremes 1/6 survive)
    VersionedTable.compact(spark, dir, "pdate")
    val b = VersionedTable.boundsMeta(spark, dir, Seq("id")).head
    assert(b === (("id", Some("1"), Some("6"), 0L)))
  }

  test("countMeta refuses a table without sidecar coverage") {
    val dir = tmp("graft-meta-refuse")
    VersionedTable.create(fixture(), dir, "pdate")
    // simulate a pre-harvest table by removing the sidecar
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecars = f.listStatus(new Path(s"$dir/data")).toSeq
      .map(st => new Path(st.getPath, FileStats.StatsFileName))
      .filter(f.exists)
    assert(sidecars.nonEmpty)
    sidecars.foreach(p => f.delete(p, false))
    val e = intercept[IllegalStateException] {
      VersionedTable.countMeta(spark, dir)
    }
    assert(e.getMessage.contains("no footer stats"))
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** OPTIMIZE bin-packing: only the small-file debt is rewritten — large
  * leaves and single-small clean partitions carry by reference
  * (path-identical in the manifest), folded dirty leaves purge their
  * delete vectors, and the whole op is a no-op when nothing qualifies.
  */
class BinpackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("folds multi-small partitions, carries large and single-small by reference") {
    val dir = Files.createTempDirectory("graft-bp").toString
    // large leaf in p=big (many rows), two small appends in p=hot,
    // one small leaf in p=lone
    val big = spark.range(50000).select(col("id"),
      concat(lit("payload-"), col("id")).as("s"), lit("big").as("p"))
    VersionedTable.create(big, dir, "p")
    VersionedTable.append(Seq((1L, "a", "hot")).toDF("id", "s", "p"), dir, "p")
    VersionedTable.append(Seq((2L, "b", "hot")).toDF("id", "s", "p"), dir, "p")
    VersionedTable.append(Seq((3L, "c", "lone")).toDF("id", "s", "p"), dir, "p")
    val before = VersionedTable.liveLeaves(spark, dir)
    val bigLeaf = before.filter(_.endsWith("p__p=big"))
    val loneLeaf = before.filter(_.endsWith("p__p=lone"))
    assert(before.count(_.endsWith("p__p=hot")) === 2)

    val (folded, fresh) = VersionedTable.binpack(spark, dir, "p", 100 * 1024L)
    assert((folded, fresh) === (2, 1), "exactly the two hot leaves fold")
    val after = VersionedTable.liveLeaves(spark, dir)
    assert(after.filter(_.endsWith("p__p=big")) === bigLeaf,
      "the large leaf must carry by reference, path-identical")
    assert(after.filter(_.endsWith("p__p=lone")) === loneLeaf,
      "a single small clean leaf must not rewrite")
    assert(after.count(_.endsWith("p__p=hot")) === 1)
    // content identical across the fold
    val ids = VersionedTable.readLatest(spark, dir)
      .filter($"p" =!= "big").select("id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
    // second run: nothing qualifies, no new version
    val v = VersionedTable.latestVersion(spark, dir)
    assert(VersionedTable.binpack(spark, dir, "p", 100 * 1024L) === ((0, 0)))
    assert(VersionedTable.latestVersion(spark, dir) === v)
  }

  test("folding a small dirty leaf purges its delete vectors") {
    val dir = Files.createTempDirectory("graft-bp-mor").toString
    VersionedTable.create(Seq((1L, "x", "p1"), (2L, "y", "p1"))
      .toDF("id", "s", "p"), dir, "p")
    VersionedTable.deleteMergeOnRead(spark, dir, $"id" === 1L)
    assert(VersionedTable.describeDetail(spark, dir)
      .select("num_dirty_leaves").collect().head.getInt(0) === 1)
    // one small dirty leaf: folds even without a sibling
    val (folded, fresh) = VersionedTable.binpack(spark, dir, "p", 100 * 1024L)
    assert(folded === 1 && fresh === 1)
    val d = VersionedTable.describeDetail(spark, dir).collect().head
    assert(d.getAs[Int]("num_dirty_leaves") === 0,
      "the folded leaf must leave the dirty set")
    assert(VersionedTable.readLatest(spark, dir)
      .select("id").as[Long].collect().toSeq === Seq(2L),
      "the vector-deleted row must stay deleted through the fold")
  }

  test("constraints and txn channels ride through a binpack") {
    val dir = Files.createTempDirectory("graft-bp-ck").toString
    VersionedTable.create(Seq((1L, "x", "p1")).toDF("id", "s", "p"), dir, "p")
    VersionedTable.addCheckConstraint(spark, dir, "id_pos", "id > 0")
    VersionedTable.appendOnce(Seq((2L, "y", "p1")).toDF("id", "s", "p"),
      dir, "p", "ch", "b1")
    VersionedTable.binpack(spark, dir, "p", 100 * 1024L)
    assert(VersionedTable.checkConstraints(spark, dir).map(_._1) === Seq("id_pos"))
    // the channel's exactly-once memory survives: replay is a no-op
    VersionedTable.appendOnce(Seq((2L, "y", "p1")).toDF("id", "s", "p"),
      dir, "p", "ch", "b1")
    assert(VersionedTable.readLatest(spark, dir).count() === 2)
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** ALTER COLUMN TYPE — a metadata-only lossless WIDENING commit (the
  * Delta type-widening feature): old leaves read through the vectorized
  * readers' type promotion (no rewrite), prior versions time-travel
  * with their own type, post-widen writes carry the wide type, and
  * every lossy shape refuses loudly. Engine-extension territory — the
  * reference (config/DeletionCriteria.java) has no schema surface.
  */
class WidenColumnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  private def mkTable(fmt: String = "parquet"): String = {
    val dir = Files.createTempDirectory("graft-widen").toString
    val df = Seq(
      (1L, "a", 10, 1.5f), (2L, "a", 20, 2.5f),
      (3L, "b", 30, 3.5f), (4L, "b", 40, 4.5f)
    ).toDF("id", "kind", "n", "x")
    VersionedTable.create(df, dir, "kind", format = fmt)
    dir
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("widening is metadata-only: head reads the wide type with the " +
      "old values (leaves untouched), prior versions keep the narrow " +
      "type, post-widen writes carry wide values") {
    val dir = mkTable()
    val leavesBefore = VersionedTable.liveLeaves(spark, dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN n TYPE BIGINT")
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN x TYPE DOUBLE")
    assert(VersionedTable.liveLeaves(spark, dir) === leavesBefore,
      "a widening must not move a leaf byte")
    val head = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(head.schema("n").dataType.sql === "BIGINT")
    assert(head.schema("x").dataType.sql === "DOUBLE")
    assert(head.orderBy("id").select("n").as[Long].collect().toSeq
      === Seq(10L, 20L, 30L, 40L))
    assert(head.orderBy("id").select("x").as[Double].collect().toSeq
      === Seq(1.5, 2.5, 3.5, 4.5))
    // prior version still reads INT/FLOAT
    val v0 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 0")
    assert(v0.schema("n").dataType.sql === "INT")
    assert(v0.schema("x").dataType.sql === "FLOAT")
    // a value beyond int range lands through the widened schema
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(5, 'a', 3000000000, 5.5)")
    assert(spark.sql(s"SELECT n FROM graft.`$dir` WHERE id = 5")
      .as[Long].collect().toSeq === Seq(3000000000L))
    // aggregates and predicates mix old-leaf (promoted) and new-leaf
    // (native wide) rows in one scan
    assert(spark.sql(s"SELECT sum(n) FROM graft.`$dir`")
      .collect().head.getLong(0) === 100L + 3000000000L)
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE n >= 30")) === Seq(3L, 4L, 5L))
    // DML over the widened column; COW rewrite keeps the wide type
    spark.sql(s"DELETE FROM graft.`$dir` WHERE n = 20")
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`"))
      === Seq(1L, 3L, 4L, 5L))
    spark.sql(s"UPDATE graft.`$dir` SET n = n + 1 WHERE id = 1")
    assert(spark.sql(s"SELECT n FROM graft.`$dir` WHERE id = 1")
      .as[Long].collect().toSeq === Seq(11L))
  }

  test("ORC tables widen the same way (the ORC reader promotes too)") {
    val dir = mkTable(fmt = "orc")
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN n TYPE BIGINT")
    assert(spark.sql(s"SELECT sum(n) FROM graft.`$dir`")
      .collect().head.getLong(0) === 100L)
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (5, 'b', 3000000000, 5.5)")
    assert(spark.sql(s"SELECT sum(n) FROM graft.`$dir`")
      .collect().head.getLong(0) === 100L + 3000000000L)
  }

  test("widening composes with RENAME (the physical mapping is " +
      "preserved through the retype)") {
    val dir = mkTable()
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN n TO amount")
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN amount TYPE BIGINT")
    assert(spark.sql(s"SELECT amount FROM graft.`$dir` WHERE id = 3")
      .as[Long].collect().toSeq === Seq(30L),
      "the widened read must still map through the physical name")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (6, 'a', 60, 6.5)")
    assert(spark.sql(s"SELECT sum(amount) FROM graft.`$dir`")
      .collect().head.getLong(0) === 160L)
  }

  test("refusals: narrowing, lossy long->double, partition column, " +
      "missing column — each naming itself; nothing commits") {
    val dir = mkTable()
    // Spark's analyzer refuses non-up-castable retypes before the
    // catalog sees them; the kernel's own gate covers the rest (e.g.
    // long->double IS an analyzer up-cast but LOSES integer precision)
    val narrow = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN id TYPE INT")
    }
    assert(narrow.getMessage.nonEmpty, narrow.getMessage)
    val lossy = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN id TYPE DOUBLE")
    }
    assert(lossy.getMessage.contains("LOSSLESS"), lossy.getMessage)
    val part = intercept[UnsupportedOperationException] {
      VersionedTable.widenColumnType(spark, dir, "kind",
        org.apache.spark.sql.types.StringType)
    }
    assert(part.getMessage.contains("partition column"), part.getMessage)
    val missing = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN nope TYPE BIGINT")
    }
    assert(missing.getMessage.contains("nope"), missing.getMessage)
    assert(VersionedTable.latestVersion(spark, dir) === 0,
      "refused statements must not commit versions")
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** ALTER TABLE DROP COLUMN — the schema-level complement of the
  * takedown story, as a metadata-only NARROWING commit: the head (and
  * everything after) reads without the column, every PRIOR version
  * still reads it via time travel, the bytes physically retire at the
  * next rewrite (compact), and the dangerous shapes (partition column,
  * constraint-referenced column) refuse loudly.
  */
class DropColumnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-dropcol").toString
    val df = Seq(
      (1L, "a", "s1", 10L), (2L, "a", "s2", 20L),
      (3L, "b", "s3", 30L), (4L, "b", "s4", 40L)
    ).toDF("id", "kind", "secret", "amount")
    VersionedTable.create(df, dir, "kind")
    dir
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("drop narrows the head, prior versions keep the column, appends " +
      "and DML keep working, compact physically retires the bytes") {
    val dir = mkTable()
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN secret")
    // head reads WITHOUT the column
    val head = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(head.schema.fieldNames.toSeq === Seq("id", "kind", "secret",
      "amount").filterNot(_ == "secret"))
    assert(ids(head) === (1L to 4L))
    // prior version still reads it, values intact
    val v0 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 0")
    assert(v0.schema.fieldNames.contains("secret"))
    assert(v0.orderBy("id").select("secret").as[String].collect().toSeq
      === Seq("s1", "s2", "s3", "s4"))
    // an append without the column is the normal narrow-schema append
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (5, 'a', 50)")
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`")) === (1L to 5L))
    // DML over the narrowed schema
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 2")
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`"))
      === Seq(1L, 3L, 4L, 5L))
    // compact folds the NARROWED view: the fresh leaves physically lose
    // the column (governance-grade erasure = drop + compact + vacuum)
    VersionedTable.compact(spark, dir, "kind")
    val newLeaves = VersionedTable.liveLeaves(spark, dir)
    val physical = spark.read.parquet(
      newLeaves.map(l => s"$dir/$l"): _*)
    assert(!physical.schema.fieldNames.contains("secret"),
      s"compact must retire the dropped column's bytes: " +
        physical.schema.fieldNames.mkString(", "))
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`"))
      === Seq(1L, 3L, 4L, 5L))
  }

  test("refusals: partition column, constraint-referenced column, " +
      "missing column (IF EXISTS skips), nested field") {
    val dir = mkTable()
    val part = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN kind")
    }
    assert(part.getMessage.contains("partition column"), part.getMessage)
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD CONSTRAINT amount_pos CHECK (amount > 0)")
    val con = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN amount")
    }
    assert(con.getMessage.contains("amount_pos"), con.getMessage)
    // after dropping the constraint, the column drop proceeds
    spark.sql(s"ALTER TABLE graft.`$dir` DROP CONSTRAINT amount_pos")
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN amount")
    assert(!spark.sql(s"SELECT * FROM graft.`$dir`")
      .schema.fieldNames.contains("amount"))
    // a missing column refuses; IF EXISTS skips silently
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN nope")
    }
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN IF EXISTS nope")
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`")) === (1L to 4L))
  }
}

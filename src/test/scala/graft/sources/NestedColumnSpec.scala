package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, expr, lit, struct}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Nested (struct-field) schema evolution + DML — the same
  * metadata-only contracts as the top-level commits, one tree level
  * down: ADD appends a field that pre-evolution leaves read as null
  * (reader struct clipping), DROP narrows the requested struct, RENAME
  * commits through the phys composite's nested mapping (both leaf eras
  * read through [[SnapshotConnector.physSchema]]'s recursion), and
  * `UPDATE SET s.a = …` rebuilds the struct inside the COW kernel.
  * Reference context: the reference engine has no schema surface at all
  * (config/DeletionCriteria.java builds WHERE strings); engine
  * extension alongside RenameColumnSpec.
  */
class NestedColumnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  /** id, kind, meta struct<src:string,score:bigint>, amount */
  private def mkTable(fmt: String = "parquet"): String = {
    val dir = Files.createTempDirectory("graft-nested").toString
    val df = Seq(
      (1L, "a", "web", 10L, 100L), (2L, "a", "api", 20L, 200L),
      (3L, "b", "web", 30L, 300L), (4L, "b", "crawl", 40L, 400L)
    ).toDF("id", "kind", "src", "score", "amount")
      .select(col("id"), col("kind"),
        struct(col("src"), col("score")).as("meta"), col("amount"))
    VersionedTable.create(df, dir, "kind", format = fmt)
    dir
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("nested ADD is metadata-only: old rows read null, new writes " +
      "carry the field, predicates answer through both eras") {
    val dir = mkTable()
    val leavesBefore = VersionedTable.liveLeaves(spark, dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (meta.lang STRING)")
    assert(VersionedTable.liveLeaves(spark, dir) === leavesBefore)
    val head = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(head.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq
      === Seq("src", "score", "lang"))
    // pre-evolution rows null-fill the new nested field
    assert(head.where("meta.lang IS NULL").count() === 4L)
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(5, 'a', named_struct('src', 'api', 'score', 50L, 'lang', 'en'), 500)")
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE meta.lang = 'en'")) === Seq(5L))
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE meta.lang IS NULL"))
      === Seq(1L, 2L, 3L, 4L))
    // time travel: the pre-evolution version has no nested field
    val v0 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 0")
    assert(v0.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq
      === Seq("src", "score"))
  }

  test("nested DROP narrows the struct: head loses the field, time " +
      "travel keeps it, bytes carry by reference") {
    val dir = mkTable()
    val leavesBefore = VersionedTable.liveLeaves(spark, dir)
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN meta.score")
    assert(VersionedTable.liveLeaves(spark, dir) === leavesBefore)
    val head = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(head.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq
      === Seq("src"))
    assert(head.where("meta.src = 'web'").count() === 2L)
    val v0 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 0")
    assert(v0.where("meta.score >= 30").count() === 2L)
  }

  test("nested RENAME is the column-mapping commit one level down: " +
      "head reads new name with old values, writes land physical, " +
      "both leaf eras read uniformly, predicates answer") {
    val dir = mkTable()
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN meta.src TO origin")
    val head = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(head.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq
      === Seq("origin", "score"))
    // values came through the mapping — a naive by-name read null-fills
    assert(head.orderBy("id").select("meta.origin").as[String]
      .collect().toSeq === Seq("web", "api", "web", "crawl"))
    // writes after the rename: the new leaf physically carries the OLD
    // (physical) field name
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(5, 'a', named_struct('origin', 'feed', 'score', 50L), 500)")
    val newest = VersionedTable.liveLeaves(spark, dir)
    val physical = spark.read.parquet(newest.map(l => s"$dir/$l"): _*)
    assert(physical.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.contains("src"),
      s"leaves must stay physical: ${physical.schema("meta").dataType}")
    // predicates on the renamed nested field, across both eras
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE meta.origin = 'web'"))
      === Seq(1L, 3L))
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE meta.origin = 'feed'"))
      === Seq(5L))
    // time travel to the pre-rename version reads the OLD field name
    val v0 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 0")
    assert(v0.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq
      === Seq("src", "score"))
    // rename BACK drops the mapping and reads stay right
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN meta.origin TO src")
    assert(spark.sql(s"SELECT meta.src FROM graft.`$dir` WHERE id = 5")
      .as[String].collect().toSeq === Seq("feed"))
  }

  test("nested rename composes with a TOP-level rename and with " +
      "compact; DML through the renamed nested name") {
    val dir = mkTable()
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN meta.src TO origin")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN meta TO info")
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE info.origin = 'web'"))
      === Seq(1L, 3L))
    // DELETE through the doubly-renamed path (COW rewrite maps back)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE info.origin = 'api'")
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`"))
      === Seq(1L, 3L, 4L))
    // UPDATE of a nested field: struct rebuild inside the COW kernel
    spark.sql(s"UPDATE graft.`$dir` SET info.origin = 'spider' " +
      "WHERE info.origin = 'crawl'")
    assert(spark.sql(s"SELECT info.origin FROM graft.`$dir` WHERE id = 4")
      .as[String].collect().toSeq === Seq("spider"))
    // untouched sibling field carried through the rebuild
    assert(spark.sql(s"SELECT info.score FROM graft.`$dir` WHERE id = 4")
      .as[Long].collect().toSeq === Seq(40L))
    // and the other rows' structs are untouched
    assert(spark.sql(
      s"SELECT sum(info.score) FROM graft.`$dir`")
      .as[Long].collect().head === 10L + 30L + 40L)
    // compact folds the mapping away and keeps the logical view
    VersionedTable.compact(spark, dir, "kind")
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE info.origin = 'spider'"))
      === Seq(4L))
  }

  test("UPDATE SET s.a with multiple nested assignments on one column " +
      "combines into one struct rebuild") {
    val dir = mkTable()
    spark.sql(s"UPDATE graft.`$dir` SET meta.src = 'x', meta.score = 0 " +
      "WHERE id = 1")
    val r = spark.sql(
      s"SELECT meta.src, meta.score, amount FROM graft.`$dir` WHERE id = 1")
      .collect().head
    assert(r === Row("x", 0L, 100L))
    // other rows untouched
    assert(spark.sql(s"SELECT sum(meta.score) FROM graft.`$dir`")
      .as[Long].collect().head === 0L + 20L + 30L + 40L)
  }

  test("MERGE matched UPDATE of a nested field rebuilds the struct; " +
      "NOT MATCHED BY SOURCE nested update too") {
    val dir = mkTable()
    Seq((1L, "fixed")).toDF("id", "src2").createOrReplaceTempView("nm_src")
    spark.sql(s"MERGE INTO graft.`$dir` t USING nm_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET t.meta.src = s.src2")
    val r1 = spark.sql(
      s"SELECT meta.src, meta.score FROM graft.`$dir` WHERE id = 1")
      .collect().head
    assert(r1.getString(0) === "fixed" && r1.getLong(1) === 10L)
    // sibling rows untouched
    assert(spark.sql(s"SELECT meta.src FROM graft.`$dir` WHERE id = 2")
      .as[String].collect().toSeq === Seq("api"))
    // table-sync idiom with a NESTED assignment on the unmatched side
    spark.sql(s"MERGE INTO graft.`$dir` t USING nm_src s ON t.id = s.id " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.meta.score = 0")
    assert(spark.sql(s"SELECT sum(meta.score) FROM graft.`$dir`")
      .as[Long].collect().head === 10L) // 2,3,4 zeroed; 1 keeps 10
  }

  test("nested evolution on an ORC table: add + rename read through " +
      "both eras") {
    val dir = mkTable(fmt = "orc")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (meta.lang STRING)")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`")
      .where("meta.lang IS NULL").count() === 4L)
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN meta.src TO origin")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (5, 'a', " +
      "named_struct('origin', 'feed', 'score', 50L, 'lang', 'en'), 500)")
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE meta.origin = 'web'"))
      === Seq(1L, 3L))
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE meta.lang = 'en'")) === Seq(5L))
  }

  test("nested ALTER COLUMN TYPE: lossless widening reads old leaves " +
      "through nested type promotion (parquet and ORC); narrowing " +
      "refuses") {
    for (fmt <- Seq("parquet", "orc")) {
      val dir = Files.createTempDirectory(s"graft-nwide-$fmt").toString
      val df = Seq((1L, "a", 7, 10L), (2L, "b", 9, 20L))
        .toDF("id", "kind", "sc", "amount")
        .select(col("id"), col("kind"),
          struct(col("sc").as("score")).as("meta"), col("amount"))
      VersionedTable.create(df, dir, "kind", format = fmt)
      spark.sql(s"ALTER TABLE graft.`$dir` " +
        "ALTER COLUMN meta.score TYPE BIGINT")
      // old leaves promote in place; a post-widen insert carries values
      // beyond int range into the SAME nested field
      spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
        "(3, 'a', named_struct('score', 3000000000L), 30)")
      assert(spark.sql(s"SELECT sum(meta.score) FROM graft.`$dir`")
        .as[Long].collect().head === 7L + 9L + 3000000000L)
      // time travel keeps the narrow type
      assert(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 0")
        .schema("meta").dataType.asInstanceOf[
          org.apache.spark.sql.types.StructType]("score").dataType
        === IntegerType)
      // Spark's analyzer already rejects the bigint→int narrowing at
      // the V2 change level; our own LOSSLESS gate backs it for direct
      // library calls
      intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$dir` " +
          "ALTER COLUMN meta.score TYPE INT")
      }
      val narrow = intercept[UnsupportedOperationException] {
        VersionedTable.widenNestedFieldType(spark, dir,
          Seq("meta", "score"), IntegerType)
      }
      assert(narrow.getMessage.contains("LOSSLESS"), narrow.getMessage)
    }
  }

  test("change feed across nested evolution aligns by physical name") {
    val dir = mkTable()                                    // v0: 4 inserts
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN meta.src TO origin")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE meta.origin = 'api'") // v2
    val feed = VersionedTable.changeFeed(spark, dir, -1,
      VersionedTable.latestVersion(spark, dir))
    // v0's inserts carry original values under the NEW nested name
    assert(feed.filter("_commit_version = 0 AND _change_type = 'insert'")
      .orderBy("id").select("meta.origin").as[String].collect().toSeq
      === Seq("web", "api", "web", "crawl"))
    assert(feed.filter("_change_type = 'delete'")
      .select("meta.origin").as[String].collect().toSeq === Seq("api"))
  }

  test("refusals: array/map descent, partition column, sibling " +
      "physical-name collisions, constraint-referenced field, unsafe " +
      "names, nested DEFAULT") {
    val dir = mkTable()
    // descent through a non-struct refuses by name
    val arr = intercept[Exception] {
      VersionedTable.addNestedField(spark, dir,
        Seq("amount", "x"), IntegerType)
    }
    assert(arr.getMessage.contains("struct"), arr.getMessage)
    // partition column
    val part = intercept[UnsupportedOperationException] {
      VersionedTable.addNestedField(spark, dir,
        Seq("kind", "x"), IntegerType)
    }
    assert(part.getMessage.contains("partition"), part.getMessage)
    // rename, then: adding a field under the freed logical name refuses
    // (sibling frozen physical), renaming a sibling onto it refuses too
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN meta.src TO origin")
    val add = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (meta.src STRING)")
    }
    assert(add.getMessage.contains("PHYSICAL"), add.getMessage)
    val ren = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN meta.score TO src")
    }
    assert(ren.getMessage.contains("PHYSICAL"), ren.getMessage)
    // constraint-referenced nested field
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD CONSTRAINT score_pos CHECK (meta.score > 0)")
    val con = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN meta.score")
    }
    assert(con.getMessage.contains("score_pos"), con.getMessage)
    // unsafe characters in the new name
    val bad = intercept[Exception] {
      VersionedTable.renameNestedField(spark, dir,
        Seq("meta", "score"), "a=b")
    }
    assert(bad.getMessage.contains("column-mapping"), bad.getMessage)
    // nested DEFAULT refuses loudly
    val dflt = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE graft.`$dir` ADD COLUMNS (meta.n INT DEFAULT 7)")
    }
    assert(dflt.getMessage.contains("NESTED"), dflt.getMessage)
    // nothing above committed the refused shapes: head still healthy
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE meta.origin = 'web'"))
      === Seq(1L, 3L))
  }
}

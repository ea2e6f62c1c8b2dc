package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** ALTER TABLE RENAME COLUMN — a metadata-only commit through the
  * manifest schema's column mapping (the Delta column-mapping idea):
  * the head reads the NEW name with the old values (never a silent
  * null-fill), every PRIOR version keeps the old name via time travel,
  * no leaf byte moves, and writes after the rename keep landing under
  * the frozen PHYSICAL name so old- and new-era leaves stay uniform.
  * Reference context: the reference engine has no schema surface at
  * all (config/DeletionCriteria.java builds WHERE strings); this is
  * engine-extension territory alongside DROP COLUMN.
  */
class RenameColumnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-rencol").toString
    val df = Seq(
      (1L, "a", "s1", 10L), (2L, "a", "s2", 20L),
      (3L, "b", "s3", 30L), (4L, "b", "s4", 40L)
    ).toDF("id", "kind", "label", "amount")
    VersionedTable.create(df, dir, "kind")
    dir
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("rename is metadata-only: head reads the new name with the OLD " +
      "values, prior versions keep the old name, leaves are untouched") {
    val dir = mkTable()
    val leavesBefore = VersionedTable.liveLeaves(spark, dir)
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN label TO tag")
    // metadata-only: same leaves, one more version
    assert(VersionedTable.liveLeaves(spark, dir) === leavesBefore)
    val head = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(head.schema.fieldNames.toSeq
      === Seq("id", "kind", "tag", "amount"))
    // the VALUES came through the mapping — a naive by-name read of the
    // physical files would null-fill here
    assert(head.orderBy("id").select("tag").as[String].collect().toSeq
      === Seq("s1", "s2", "s3", "s4"))
    // time travel to the pre-rename version reads the OLD name
    val v0 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 0")
    assert(v0.schema.fieldNames.contains("label") &&
      !v0.schema.fieldNames.contains("tag"))
    assert(v0.orderBy("id").select("label").as[String].collect().toSeq
      === Seq("s1", "s2", "s3", "s4"))
    // predicates on the renamed column answer correctly (the filter
    // translates to the physical name at the scan)
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE tag = 's3'")) === Seq(3L))
    assert(ids(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE tag >= 's2'")) === Seq(2L, 3L, 4L))
  }

  test("writes after a rename: appends and DML land under the frozen " +
      "physical name, both leaf eras read uniformly, compact keeps it") {
    val dir = mkTable()
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN label TO tag")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (5, 'a', 's5', 50)")
    val head = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(head.orderBy("id").select("tag").as[String].collect().toSeq
      === Seq("s1", "s2", "s3", "s4", "s5"))
    // the NEW leaf physically carries the OLD (physical) name — the
    // uniformity that keeps every era readable through one mapping
    val newest = VersionedTable.liveLeaves(spark, dir)
    val physical = spark.read.parquet(newest.map(l => s"$dir/$l"): _*)
    assert(physical.schema.fieldNames.contains("label") &&
      !physical.schema.fieldNames.contains("tag"),
      s"leaves must stay physical: ${physical.schema.fieldNames.mkString(",")}")
    // DML through the new name
    spark.sql(s"DELETE FROM graft.`$dir` WHERE tag = 's2'")
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`"))
      === Seq(1L, 3L, 4L, 5L))
    spark.sql(s"UPDATE graft.`$dir` SET amount = 0 WHERE tag = 's3'")
    assert(spark.sql(s"SELECT sum(amount) FROM graft.`$dir`")
      .collect().head.getLong(0) === 10L + 40L + 50L)
    // MERGE keyed on the renamed column
    Seq(("s4", 400L), ("s6", 60L)).toDF("tag", "amount")
      .withColumn("id", $"amount" / 10)
      .withColumn("kind", org.apache.spark.sql.functions.lit("b"))
      .createOrReplaceTempView("ren_src")
    spark.sql(s"MERGE INTO graft.`$dir` t USING ren_src s " +
      "ON t.tag = s.tag " +
      "WHEN MATCHED THEN UPDATE SET t.amount = s.amount " +
      "WHEN NOT MATCHED THEN INSERT (id, kind, tag, amount) " +
      "VALUES (s.id, s.kind, s.tag, s.amount)")
    assert(spark.sql(s"SELECT amount FROM graft.`$dir` WHERE tag = 's4'")
      .collect().head.getLong(0) === 400L)
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`"))
      === Seq(1L, 3L, 4L, 5L, 6L))
    // compact folds and the mapping survives (physical name persists)
    VersionedTable.compact(spark, dir, "kind")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`")
      .schema.fieldNames.toSeq === Seq("id", "kind", "tag", "amount"))
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`"))
      === Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("rename composes with evolution: rename an evolved column, " +
      "rename back drops the mapping, drop a renamed column") {
    val dir = mkTable()
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (score BIGINT)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (5, 'b', 's5', 50, 555)")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN score TO rank")
    val head = spark.sql(s"SELECT id, rank FROM graft.`$dir`").orderBy("id")
    // pre-evolution rows null-fill, the evolved row keeps its value —
    // through the rename
    assert(head.collect().map(r =>
      if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq
      === Seq(-1L, -1L, -1L, -1L, 555L))
    // rename BACK to the physical name: mapping drops, reads stay right
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN rank TO score")
    assert(spark.sql(s"SELECT score FROM graft.`$dir` WHERE id = 5")
      .collect().head.getLong(0) === 555L)
    // chain: rename twice, then DROP the renamed column
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN label TO tag")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN tag TO name")
    assert(spark.sql(s"SELECT name FROM graft.`$dir` WHERE id = 1")
      .collect().head.getString(0) === "s1")
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN name")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").schema.fieldNames.toSeq
      === Seq("id", "kind", "amount", "score"))
  }

  test("change feed across a rename aligns by physical name: " +
      "pre-rename change rows carry their values, never null-fill") {
    val dir = mkTable()                                   // v0: 4 inserts
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 2")   // v1: delete
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN label TO tag") // v2
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (6, 'a', 's6', 60)")  // v3
    val feed = VersionedTable.changeFeed(spark, dir, -1,
      VersionedTable.latestVersion(spark, dir))
    assert(feed.schema.fieldNames.contains("tag"))
    // v0's insert rows carry the ORIGINAL label values under the new name
    val v0tags = feed.filter("_commit_version = 0 AND _change_type = 'insert'")
      .orderBy("id").select("tag").as[String].collect().toSeq
    assert(v0tags === Seq("s1", "s2", "s3", "s4"))
    // the delete row too
    assert(feed.filter("_commit_version = 1 AND _change_type = 'delete'")
      .select("tag").as[String].collect().toSeq === Seq("s2"))
    // the rename commit itself is silent (metadata-only)
    assert(feed.filter("_commit_version = 2").count() === 0L)
    assert(feed.filter("_commit_version = 3 AND _change_type = 'insert'")
      .select("tag").as[String].collect().toSeq === Seq("s6"))
  }

  test("bloom skip index survives a rename: refresh maps the logical " +
      "key through the physical name, probes keep pruning") {
    val dir = mkTable()
    BloomSkipIndex.attach(spark, dir, "id")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN id TO rid")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (9, 'a', 's9', 90)")
    // refresh under the (stale) attach-time name — the physical name —
    // still works, and probing through the NEW logical name answers
    val (fresh, kept, _) = BloomSkipIndex.attach(spark, dir, "id")
    assert(fresh >= 1 && kept >= 1)
    assert(spark.sql(s"SELECT * FROM graft.`$dir` WHERE rid = 9")
      .count() === 1L)
    assert(spark.sql(s"SELECT * FROM graft.`$dir` WHERE rid = 12345")
      .count() === 0L)
  }

  test("physical-name freeze: after RENAME label→tag, neither ADD " +
      "COLUMNS (label) nor renaming another column to 'label' is " +
      "allowed — leaves already store bytes under that name") {
    val dir = mkTable()
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN label TO tag")
    // ADD COLUMNS under the freed logical name would put TWO columns
    // under physical 'label' (duplicate physSchema fields; the renamed
    // column's sidecar stats/bloom consulted for the new column)
    val add = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (label STRING)")
    }
    assert(add.getMessage.contains("PHYSICAL"), add.getMessage)
    val ren = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN amount TO label")
    }
    assert(ren.getMessage.contains("PHYSICAL"), ren.getMessage)
    // renaming BACK to the column's OWN physical name stays allowed
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN tag TO label")
    assert(spark.sql(s"SELECT label FROM graft.`$dir` WHERE id = 1")
      .collect().head.getString(0) === "s1")
  }

  test("refusals: partition column, constraint-referenced column, " +
      "missing column, name collision, same-name no-op") {
    val dir = mkTable()
    val part = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN kind TO k2")
    }
    assert(part.getMessage.contains("partition column"), part.getMessage)
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD CONSTRAINT amount_pos CHECK (amount > 0)")
    val con = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN amount TO amt")
    }
    assert(con.getMessage.contains("amount_pos"), con.getMessage)
    val missing = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN nope TO yep")
    }
    assert(missing.getMessage.contains("nope"), missing.getMessage)
    val collide = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN label TO amount")
    }
    assert(collide.getMessage.contains("amount"), collide.getMessage)
    intercept[Exception] {
      VersionedTable.renameColumn(spark, dir, "label", "label")
    }
    // nothing above committed: the head still reads the original schema
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").schema.fieldNames.toSeq
      === Seq("id", "kind", "label", "amount"))
  }
}

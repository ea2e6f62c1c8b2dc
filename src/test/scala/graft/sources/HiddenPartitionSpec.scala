package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.{col, lit, to_timestamp}
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Hidden partitioning (`PARTITIONED BY (days(ts))`, `bucket(n,col)`,
  * `truncate(w,col)`) — the Iceberg contract over the versioned table's
  * layout: writers derive the partition value from the source column,
  * a PLAIN predicate on the source column prunes whole leaf
  * directories (no user-visible partition column anywhere), and the
  * COW delete rewrites exactly the affected transform tuples.
  * Reference context: the reference partitions on a `partition_id`
  * string its pipeline materializes by hand — this moves that
  * materialization inside the format.
  */
class HiddenPartitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** 8 rows across 4 days, two per day. */
  private def mkDays(): String = {
    val dir = Files.createTempDirectory("graft-hidden").toString
    val df = Seq(
      (1L, ts("2026-03-01 01:00:00"), 10L),
      (2L, ts("2026-03-01 22:00:00"), 20L),
      (3L, ts("2026-03-02 05:00:00"), 30L),
      (4L, ts("2026-03-02 23:59:59"), 40L),
      (5L, ts("2026-03-03 00:00:00"), 50L),
      (6L, ts("2026-03-03 12:00:00"), 60L),
      (7L, ts("2026-03-04 08:00:00"), 70L),
      (8L, ts("2026-03-04 20:00:00"), 80L)
    ).toDF("id", "ts", "amount")
    VersionedTable.create(df, dir, "days(ts)")
    dir
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collectFirst { case s: FileSourceScanExec => s }
      .map(_.metrics("numFiles").value).getOrElse(-1L)
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("days(ts): layout has one leaf per day, a plain ts range prunes " +
      "to exactly the covered days, equality to one day") {
    val dir = mkDays()
    val leaves = VersionedTable.liveLeaves(spark, dir)
    assert(leaves.size === 4, leaves.mkString(", "))
    assert(leaves.forall(_.contains("ts_day__p=")), leaves.mkString(", "))
    val total = scannedFiles(spark.sql(s"SELECT * FROM graft.`$dir`"))
    // range covering days 2-3 only
    val range = spark.sql(s"SELECT * FROM graft.`$dir` WHERE " +
      "ts >= TIMESTAMP'2026-03-02 12:00:00' AND " +
      "ts < TIMESTAMP'2026-03-03 12:30:00'")
    assert(ids(range) === Seq(4L, 5L, 6L))
    val rangeFiles = scannedFiles(range)
    assert(rangeFiles * 2 <= total,
      s"ts range must prune day leaves: scanned $rangeFiles of $total")
    // the boundary day (2026-03-02) is KEPT even though the cut is
    // intra-day — inclusive projection, never wrong, and the row-level
    // filter above the scan keeps results exact
    val eq = spark.sql(s"SELECT * FROM graft.`$dir` WHERE " +
      "ts = TIMESTAMP'2026-03-03 00:00:00'")
    assert(ids(eq) === Seq(5L))
    assert(scannedFiles(eq) * 4 <= total,
      "equality must prune to one day's files")
    // IS NULL skips everything (null partition values are refused at
    // write, so no leaf can hold one)
    assert(spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE ts IS NULL").count() === 0L)
  }

  test("days(ts): COW DELETE by a plain ts predicate rewrites exactly " +
      "the affected day tuples; other leaves carry by reference") {
    val dir = mkDays()
    val before = VersionedTable.liveLeaves(spark, dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE " +
      "ts >= TIMESTAMP'2026-03-02 00:00:00' AND " +
      "ts < TIMESTAMP'2026-03-03 00:00:00' AND amount > 35")
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`"))
      === Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L))
    val after = VersionedTable.liveLeaves(spark, dir)
    // days 1, 3, 4 leaves carry BY REFERENCE (same paths); only day 2
    // was rewritten
    val carried = before.filter(after.contains)
    assert(carried.size === 3,
      s"3 of 4 day leaves must carry: before=$before after=$after")
    assert(carried.forall(l => !l.contains("ts_day__p=2026-03-02")))
    // INSERT lands in the right day dirs
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(9, TIMESTAMP'2026-03-05 09:00:00', 90)")
    val leaves2 = VersionedTable.liveLeaves(spark, dir)
    assert(leaves2.exists(_.contains("ts_day__p=2026-03-05")))
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir` WHERE " +
      "ts >= TIMESTAMP'2026-03-05 00:00:00'")) === Seq(9L))
  }

  test("bucket(4, id): equality probes prune to one bucket; ranges " +
      "keep everything (a hash has no order)") {
    val dir = Files.createTempDirectory("graft-hidden-b").toString
    val df = (1L to 40L).map(i => (i, s"u$i", i * 10L))
      .toDF("id", "name", "amount")
    VersionedTable.create(df, dir, "bucket(4,id)")
    val leaves = VersionedTable.liveLeaves(spark, dir)
    assert(leaves.size >= 2 && leaves.size <= 4,
      leaves.mkString(", ")) // 40 ids over 4 buckets
    assert(leaves.forall(_.contains("id_bucket__p=")))
    val total = scannedFiles(spark.sql(s"SELECT * FROM graft.`$dir`"))
    val probe = spark.sql(s"SELECT * FROM graft.`$dir` WHERE id = 17")
    assert(ids(probe) === Seq(17L))
    assert(scannedFiles(probe) < total,
      "bucket equality must prune to one bucket's files")
    // a range keeps all buckets — and stays correct
    assert(spark.sql(s"SELECT * FROM graft.`$dir` WHERE id <= 5")
      .count() === 5L)
    // COW delete by equality touches one bucket leaf only
    val before = VersionedTable.liveLeaves(spark, dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 17")
    val after = VersionedTable.liveLeaves(spark, dir)
    assert(before.filter(after.contains).size === before.size - 1,
      s"exactly one bucket leaf rewritten: before=$before after=$after")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() === 39L)
  }

  test("truncate(10, amount): numeric ranges prune to covered buckets") {
    val dir = Files.createTempDirectory("graft-hidden-t").toString
    val df = (1L to 30L).map(i => (i, i)).toDF("id", "amount")
    VersionedTable.create(df, dir, "truncate(10,amount)")
    val leaves = VersionedTable.liveLeaves(spark, dir)
    assert(leaves.size === 4, leaves.mkString(", ")) // 0,10,20,30
    val total = scannedFiles(spark.sql(s"SELECT * FROM graft.`$dir`"))
    val q = spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE amount >= 25 AND amount < 31")
    assert(ids(q) === (25L to 30L))
    assert(scannedFiles(q) * 2 <= total,
      "numeric truncate range must prune low buckets")
  }

  test("months(ts) and hours(ts): zero-padded UTC dirs, range pruning, " +
      "COW delete touches only covered units") {
    val dir = Files.createTempDirectory("graft-hidden-m").toString
    val df = Seq(
      (1L, ts("2026-01-15 01:00:00"), 10L),
      (2L, ts("2026-02-10 02:00:00"), 20L),
      (3L, ts("2026-03-05 03:00:00"), 30L),
      (4L, ts("2026-03-25 04:00:00"), 40L)
    ).toDF("id", "ts", "amount")
    VersionedTable.create(df, dir, "months(ts)")
    val leaves = VersionedTable.liveLeaves(spark, dir)
    assert(leaves.count(_.contains("ts_month__p=")) === leaves.size)
    assert(leaves.exists(_.contains("ts_month__p=2026-03")))
    assert(leaves.size === 3) // Jan, Feb, Mar
    val total = scannedFiles(spark.sql(s"SELECT * FROM graft.`$dir`"))
    val q = spark.sql(s"SELECT * FROM graft.`$dir` WHERE " +
      "ts >= TIMESTAMP'2026-02-20 00:00:00'")
    assert(ids(q) === Seq(3L, 4L)) // Feb leaf kept (boundary), Jan pruned
    assert(scannedFiles(q) < total, "months range must prune January")
    val before = VersionedTable.liveLeaves(spark, dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE " +
      "ts >= TIMESTAMP'2026-03-01 00:00:00' AND amount < 35")
    val after = VersionedTable.liveLeaves(spark, dir)
    assert(before.filter(after.contains).size === 2,
      s"only the March leaf rewrites: before=$before after=$after")
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir`"))
      === Seq(1L, 2L, 4L))
    // hours: one table, two hours, equality prune
    val hdir = Files.createTempDirectory("graft-hidden-h").toString
    VersionedTable.create(Seq(
      (1L, ts("2026-01-15 08:10:00")), (2L, ts("2026-01-15 09:20:00"))
    ).toDF("id", "ts"), hdir, "hours(ts)")
    assert(VersionedTable.liveLeaves(spark, hdir)
      .exists(_.contains("ts_hour__p=2026-01-15-08")))
    assert(ids(spark.sql(s"SELECT * FROM graft.`$hdir` WHERE " +
      "ts >= TIMESTAMP'2026-01-15 09:00:00'")) === Seq(2L))
  }

  test("SHOW PARTITIONS-style tuples, time travel, and refusals: " +
      "unknown transform, renaming/dropping the hidden source column") {
    val dir = mkDays()
    // partition tuples list the derived day values
    val tuples = VersionedTable.partitionTuples(spark, dir)
    assert(tuples.map(_.head) ===
      Seq("2026-03-01", "2026-03-02", "2026-03-03", "2026-03-04"))
    // time travel works across hidden-partition commits
    spark.sql(s"DELETE FROM graft.`$dir` WHERE " +
      "ts < TIMESTAMP'2026-03-02 00:00:00'")
    assert(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 0")
      .count() === 8L)
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() === 6L)
    // the SOURCE column is a partition column for evolution guards
    val ren = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN ts TO t2")
    }
    assert(ren.getMessage.contains("partition column"), ren.getMessage)
    val drop = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN ts")
    }
    assert(drop.getMessage.contains("partition column"), drop.getMessage)
    // unknown transforms refuse loudly at create
    val bad = intercept[Exception] {
      val d2 = Files.createTempDirectory("graft-hidden-x").toString
      VersionedTable.create(
        Seq((1L, ts("2026-03-01 01:00:00"))).toDF("id", "ts"),
        d2, "weeks(ts)")
    }
    assert(bad.getMessage.contains("unsupported partition transform"),
      bad.getMessage)
    // null source values refuse at write like any null partition value
    val nullDir = Files.createTempDirectory("graft-hidden-n").toString
    val withNull = Seq((1L, Option(ts("2026-03-01 01:00:00"))),
      (2L, Option.empty[Timestamp])).toDF("id", "ts")
    val nul = intercept[Exception] {
      VersionedTable.create(withNull, nullDir, "days(ts)")
    }
    assert(nul.getMessage.contains("NULL"), nul.getMessage)
  }

  test("SQL CREATE TABLE ... PARTITIONED BY (days(ts)) through the " +
      "catalog; partitioning() reports the transform") {
    val dir = Files.createTempDirectory("graft-hidden-sql").toString + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, ts TIMESTAMP, amount BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, TIMESTAMP'2026-03-01 01:00:00', 10), " +
      "(2, TIMESTAMP'2026-03-02 02:00:00', 20)")
    assert(VersionedTable.liveLeaves(spark, dir)
      .exists(_.contains("ts_day__p=2026-03-01")))
    assert(ids(spark.sql(s"SELECT * FROM graft.`$dir` WHERE " +
      "ts < TIMESTAMP'2026-03-02 00:00:00'")) === Seq(1L))
    val t = new GraftCatalog()
    // partitioning() reports days(ts), not identity
    val parts = spark.sql(s"DESCRIBE TABLE EXTENDED graft.`$dir`")
      .collect().map(_.toString).mkString("\n")
    assert(parts.contains("days(ts)") || parts.contains("ts_day") ||
      parts.toLowerCase.contains("days"), parts)
  }
}

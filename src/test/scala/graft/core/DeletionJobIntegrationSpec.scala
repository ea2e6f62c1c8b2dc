package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CatalogOps
import graft.model.{DeletionCriteria, JobConfig, Metrics}
import graft.testkit.SparkTestSession

/** End-to-end parity suite — reproduces the reference's four golden
  * integration scenarios (HiveTableDeletionJobIntegrationTest.java, expected
  * results per FIXTURES.md §1) plus the multi-partition dynamic-overwrite
  * safety fixture (FIXTURES.md §3) the reference documents but never tests.
  */
class DeletionJobIntegrationSpec extends AnyFunSuite with BeforeAndAfterEach {
  private lazy val spark = SparkTestSession.spark
  private val db = "test_db"
  private val table = s"$db.test_deletion_table"

  private def catalog = new CatalogOps(spark)

  override def beforeEach(): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table (
         |  id BIGINT, name STRING, status STRING, row_create_ts TIMESTAMP
         |) PARTITIONED BY (partition_id STRING) STORED AS ORC""".stripMargin)
  }

  override def afterEach(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // sweep backup tables like the reference's @AfterEach (test :97-107)
    catalog.listTables(db).filter(_.startsWith("test_deletion_table_backup_"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $db.$t"))
  }

  /** Pattern A (FIXTURES.md §1): ids 1..n, INACTIVE when i%3==2, constant ts. */
  private def loadSampleData(n: Int = 10, partition: String = "20260213"): Unit = {
    val rows = (1 to n).map { i =>
      val status = if (i % 3 == 2) "INACTIVE" else "ACTIVE"
      s"($i, 'User$i', '$status', TIMESTAMP '2026-02-13 09:00:00')"
    }
    spark.sql(
      s"INSERT INTO $table PARTITION (partition_id='$partition') VALUES ${rows.mkString(", ")}")
  }

  /** Pattern B: all ACTIVE, ts = 2026-02-13 {8+i}:00:00 for i=1..10. */
  private def loadSampleDataWithTimestamps(): Unit = {
    val rows = (1 to 10).map { i =>
      f"($i, 'User$i', 'ACTIVE', TIMESTAMP '2026-02-13 ${8 + i}%02d:00:00')"
    }
    spark.sql(
      s"INSERT INTO $table PARTITION (partition_id='20260213') VALUES ${rows.mkString(", ")}")
  }

  private def config(criteria: DeletionCriteria, dryRun: Boolean = false): JobConfig =
    JobConfig("test_db", "test_deletion_table", criteria, dryRun = dryRun,
      validationSampleSize = 100)

  private def count(): Long = spark.table(table).count()

  test("golden 1: delete one record of ten by id within a day window") {
    loadSampleData()
    val criteria = DeletionCriteria(
      whereClause = Some("id = 5"),
      startTime = Some(Timestamp.valueOf("2026-02-13 00:00:00")),
      endTime = Some(Timestamp.valueOf("2026-02-13 23:59:59")))
    val cfg = config(criteria)
    val metrics = new Metrics

    assert(DeletionWorkflow.run(spark, cfg, metrics))
    assert(count() == 9)
    val ids = spark.sql(s"SELECT id FROM $table ORDER BY id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L, 10L))
    assert(metrics.totalRecordsDeleted == 1)
    assert(metrics.backupCreated && metrics.validationPassed)
  }

  test("golden 2: time-window only, end-exclusive (deletes exactly 2)") {
    loadSampleDataWithTimestamps()
    val criteria = DeletionCriteria(
      startTime = Some(Timestamp.valueOf("2026-02-13 10:00:00")),
      endTime = Some(Timestamp.valueOf("2026-02-13 12:00:00")))
    val metrics = new Metrics

    assert(DeletionWorkflow.run(spark, config(criteria), metrics))
    assert(metrics.totalRecordsDeleted == 2) // 10:00 and 11:00 rows; 12:00 survives
    assert(count() == 8)
    val remaining = spark.sql(
      s"SELECT count(*) FROM $table WHERE row_create_ts >= '2026-02-13 10:00:00' " +
        s"AND row_create_ts < '2026-02-13 12:00:00'").first().getLong(0)
    assert(remaining == 0)
  }

  test("golden 3: delete by status, no window (deletes 3)") {
    loadSampleData()
    val criteria = DeletionCriteria(whereClause = Some("status = 'INACTIVE'"))
    val metrics = new Metrics

    assert(DeletionWorkflow.run(spark, config(criteria), metrics))
    assert(metrics.totalRecordsDeleted == 3) // ids 2, 5, 8
    assert(count() == 7)
    assert(spark.sql(s"SELECT count(*) FROM $table WHERE status = 'INACTIVE'")
      .first().getLong(0) == 0)
  }

  test("golden 4: dry run reports 1 would-delete, data untouched") {
    loadSampleData()
    val criteria = DeletionCriteria(whereClause = Some("id = 5"))
    val metrics = new Metrics

    assert(DeletionWorkflow.run(spark, config(criteria, dryRun = true), metrics))
    assert(metrics.totalRecordsDeleted == 1)
    assert(count() == 10)
    // dry run must not mutate backup storage either (delta from the
    // reference, which backs up before its dry-run return)
    assert(!metrics.backupCreated, "dry run must not create a backup")
  }

  test("safety: deleting from one partition leaves sibling partitions intact") {
    loadSampleData(10, "20260101")
    loadSampleData(10, "20260102")
    loadSampleData(10, "20260103")
    val before01 = spark.sql(s"SELECT * FROM $table WHERE partition_id='20260101' ORDER BY id").collect().toSeq
    val before03 = spark.sql(s"SELECT * FROM $table WHERE partition_id='20260103' ORDER BY id").collect().toSeq

    val criteria = DeletionCriteria(
      whereClause = Some("status = 'INACTIVE' AND partition_id = '20260102'"))
    val metrics = new Metrics
    assert(DeletionWorkflow.run(spark, config(criteria), metrics))

    assert(metrics.totalRecordsDeleted == 3)
    assert(count() == 27)
    val after01 = spark.sql(s"SELECT * FROM $table WHERE partition_id='20260101' ORDER BY id").collect().toSeq
    val after03 = spark.sql(s"SELECT * FROM $table WHERE partition_id='20260103' ORDER BY id").collect().toSeq
    assert(after01 == before01, "partition 20260101 must be byte-identical")
    assert(after03 == before03, "partition 20260103 must be byte-identical")
  }

  test("safety: fully-emptied partition takes the drop+delete fast path") {
    loadSampleData(10, "20260101")
    loadSampleData(10, "20260102")
    val loc02 = catalog.partitionLocation(table, "partition_id", "20260102")
    assert(loc02.isDefined)

    // criteria matches ALL rows of 20260102; no time window (the coarse
    // date prune keys off partition-ID dates, which here encode January —
    // a February window would correctly prune everything)
    val criteria = DeletionCriteria(whereClause = Some("partition_id = '20260102'"))
    val metrics = new Metrics
    assert(DeletionWorkflow.run(spark, config(criteria), metrics))

    assert(metrics.totalRecordsDeleted == 10)
    assert(count() == 10)
    assert(catalog.listPartitions(table) == Seq("20260101"), "partition 20260102 must be dropped")
    assert(!catalog.pathExists(loc02.get.stripPrefix("file:")), "partition directory must be deleted")
    assert(catalog.partitionExists(table, "partition_id", "20260101"))
  }

  test("failure after backup triggers auto-restore and leaves data intact") {
    loadSampleData()
    val before = spark.sql(s"SELECT * FROM $table ORDER BY id").collect().toSeq

    // CAST(name AS INT) parses as a valid expression but throws at runtime
    // under ANSI mode. The grouped partition probe (C1) conservatively
    // includes all candidates on error, so the workflow proceeds through
    // backup and only fails at the count step — exercising the
    // catch -> recoverFromFailure -> restore path end-to-end.
    val criteria = DeletionCriteria(whereClause = Some("CAST(name AS INT) > 0"))
    val metrics = new Metrics
    val ok = DeletionWorkflow.run(spark, config(criteria), metrics)

    assert(!ok, "workflow must report failure")
    assert(metrics.backupCreated, "failure must happen after the backup step")
    val after = spark.sql(s"SELECT * FROM $table ORDER BY id").collect().toSeq
    assert(after == before, "auto-restore must leave the table byte-identical")
  }

  test("mixed batch: emptied and partially-deleted partitions in ONE batch both resolve") {
    // This is the latent reference bug our per-partition branch fixes
    // (SURVEY.md §7.4): batch-total retained > 0 would leave the emptied
    // partition's rows alive under dynamic overwrite.
    loadSampleData(10, "20260101") // 3 INACTIVE of 10
    // make 20260102 ALL INACTIVE so the criteria empties it
    val rows = (1 to 4).map(i => s"($i, 'U$i', 'INACTIVE', TIMESTAMP '2026-02-13 09:00:00')")
    spark.sql(s"INSERT INTO $table PARTITION (partition_id='20260102') VALUES ${rows.mkString(", ")}")

    val criteria = DeletionCriteria(whereClause = Some("status = 'INACTIVE'"))
    val metrics = new Metrics
    assert(DeletionWorkflow.run(spark, config(criteria), metrics))

    assert(metrics.totalRecordsDeleted == 7) // 3 + 4
    assert(spark.sql(s"SELECT count(*) FROM $table WHERE status='INACTIVE'").first().getLong(0) == 0)
    assert(catalog.listPartitions(table) == Seq("20260101"))
    assert(count() == 7)
  }
}

package graft.validation

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{DeletionCriteria, JobConfig, Metrics}
import graft.testkit.SparkTestSession

/** Direct coverage of the validation FAILURE paths — the workflow goldens
  * only ever see validation succeed. Each invariant (count tolerance,
  * sampled residual-match, partition structure, pre-deletion existence)
  * must actually fire when violated.
  */
class ValidationSpec extends AnyFunSuite with BeforeAndAfterEach {
  private lazy val spark = SparkTestSession.spark
  private val db = "validation_spec_db"
  private val table = s"$db.val_source"

  private def criteria = DeletionCriteria(whereClause = Some("status = 'INACTIVE'"))
  private def config(tolerance: Double = 0.0, enabled: Boolean = true): JobConfig =
    JobConfig(db, "val_source", criteria, validationEnabled = enabled,
      validationTolerancePercent = tolerance, validationSampleSize = 100)

  private def manager(cfg: JobConfig) = new ValidationManager(spark, cfg, new Metrics)

  override def beforeEach(): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table (id BIGINT, status STRING)
         |PARTITIONED BY (partition_id STRING) STORED AS ORC""".stripMargin)
    // post-deletion-like state: 8 ACTIVE rows, nothing INACTIVE
    val rows = (1 to 8).map(i => s"($i, 'ACTIVE')").mkString(", ")
    spark.sql(s"INSERT INTO $table PARTITION (partition_id='20260101') VALUES $rows")
  }

  override def afterEach(): Unit = spark.sql(s"DROP TABLE IF EXISTS $table")

  test("clean post-deletion state passes and marks metrics") {
    val metrics = new Metrics
    new ValidationManager(spark, config(), metrics)
      .validatePostDeletion(Seq("20260101"), recordsDeleted = 2, recordsRetained = 8)
    assert(metrics.validationPassed)
  }

  test("count outside tolerance fails; inside tolerance passes") {
    // actual retained is 8; claim 10 expected -> exact mode must fail
    intercept[ValidationException](manager(config())
      .validatePostDeletion(Seq("20260101"), 0, recordsRetained = 10))
    // 25% tolerance around 10 allows [8, 12] (floor) -> passes the count
    manager(config(tolerance = 25.0))
      .validatePostDeletion(Seq("20260101"), 0, recordsRetained = 10)
  }

  test("surviving rows matching the delete predicate fail validation") {
    spark.sql(s"INSERT INTO $table PARTITION (partition_id='20260101') VALUES (99, 'INACTIVE')")
    val e = intercept[ValidationException](manager(config())
      .validatePostDeletion(Seq("20260101"), 0, recordsRetained = 9))
    // fires in the sampled-integrity stage (sample = full data here), before
    // the final zero-residual count
    assert(e.getMessage.contains("integrity"))
  }

  test("dropped partitions are excluded from the structure check (C11 fix)") {
    // 20260199 was legitimately dropped by the fast path: it must NOT fail
    // validation when passed as dropped, and MUST when not
    manager(config()).validatePostDeletion(
      Seq("20260101", "20260199"), 0, recordsRetained = 8,
      droppedPartitions = Set("20260199"))
    intercept[ValidationException](manager(config()).validatePostDeletion(
      Seq("20260101", "20260199"), 0, recordsRetained = 8))
  }

  test("disabled validation skips everything including failures") {
    val metrics = new Metrics
    new ValidationManager(spark, config(enabled = false), metrics)
      .validatePostDeletion(Seq("20260101"), 0, recordsRetained = 12345)
    assert(!metrics.validationPassed, "skipped validation must not claim success")
  }

  test("pre-deletion validation rejects missing tables and partitions") {
    intercept[ValidationException] {
      new ValidationManager(spark,
        JobConfig(db, "no_such_table", criteria), new Metrics)
        .validatePreDeletion(Seq("20260101"))
    }
    intercept[ValidationException](
      manager(config()).validatePreDeletion(Seq("20260101", "29990101")))
    // existing partitions pass
    manager(config()).validatePreDeletion(Seq("20260101"))
  }
}

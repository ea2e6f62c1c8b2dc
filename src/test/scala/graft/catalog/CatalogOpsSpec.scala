package graft.catalog

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** DDL-safety suite for the metastore algebra: partition values flow into
  * `PARTITION (...)` clauses only via PartitionId.partitionSpec, so values
  * containing quotes cannot break (or inject into) the generated SQL —
  * the reference interpolates raw (DeletionExecutor.java:190-194).
  */
class CatalogOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark
  private val db = "catalog_ops_db"
  private val table = s"$db.quoted_parts"
  private lazy val catalog = new CatalogOps(spark)

  // a partition value containing a single quote
  private val evil = "it's-20260101"

  override def beforeAll(): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table (id BIGINT)
         |PARTITIONED BY (partition_id STRING) STORED AS ORC""".stripMargin)
    spark.sql(s"INSERT INTO $table PARTITION (partition_id='plain') VALUES (1)")
    spark.sql(s"ALTER TABLE $table ADD PARTITION " +
      s"(${graft.partition.PartitionId.partitionSpec("partition_id", evil)})")
  }

  override def afterAll(): Unit = spark.sql(s"DROP TABLE IF EXISTS $table")

  test("partitionSpec escapes backslashes before quotes") {
    import graft.partition.PartitionId.partitionSpec
    assert(partitionSpec("p", "it's") == "p='it\\'s'")
    // a trailing backslash must not swallow the closing quote
    assert(partitionSpec("p", "v\\") == "p='v\\\\'")
    assert(partitionSpec("p", "a\\'b") == "p='a\\\\\\'b'")
  }

  test("partitionExists handles a quote-bearing partition value") {
    assert(catalog.partitionExists(table, "partition_id", evil))
    assert(catalog.partitionExists(table, "partition_id", "plain"))
    assert(!catalog.partitionExists(table, "partition_id", "it's-missing"))
  }

  test("partitionLocation resolves a quote-bearing partition value") {
    val loc = catalog.partitionLocation(table, "partition_id", evil)
    assert(loc.isDefined)
    assert(loc.get.nonEmpty)
  }

  test("dropPartition drops a quote-bearing partition without SQL breakage") {
    catalog.dropPartition(table, "partition_id", evil)
    assert(!catalog.partitionExists(table, "partition_id", evil))
    // sibling untouched
    assert(catalog.partitionExists(table, "partition_id", "plain"))
  }
}

package graft.core

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{DeletionCriteria, JobConfig, Metrics}
import graft.testkit.{PropertyChecks, SparkTestSession}

/** Property-based deletion invariants over random predicates and random
  * fixtures (SURVEY.md §5 port strategy): for every generated criteria on
  * every generated table state,
  *
  *   1. deleted + retained == before          (conservation)
  *   2. retained ∩ predicate == ∅             (completeness)
  *   3. retained == rows not matching          (soundness — nothing extra
  *      disappears, checked as a full multiset of ids)
  *
  * Runs the real kernel (DeletionExecutor over the embedded Hive table,
  * including the per-partition drop/rewrite/skip branches and batching) —
  * not a model of it.
  */
class DeletionPropertySpec extends AnyFunSuite with PropertyChecks with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark
  private val db = "prop_db"
  private val table = s"$db.prop_deletion_table"

  override protected val propertyIterations: Int = 12

  override def beforeAll(): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table (
         |  id BIGINT, name STRING, status STRING, row_create_ts TIMESTAMP
         |) PARTITIONED BY (partition_id STRING) STORED AS ORC""".stripMargin)
  }

  override def afterAll(): Unit = spark.sql(s"DROP TABLE IF EXISTS $table")

  private val partitions = Seq("20260101", "20260102")

  private case class Fixture(rows: Seq[(Long, String, String, Int, String)])

  private val statusGen = Gen.oneOf("ACTIVE", "INACTIVE", "PENDING")

  private val fixtureGen: Gen[Fixture] = for {
    n <- Gen.choose(8, 36)
    statuses <- Gen.listOfN(n, statusGen)
    hours <- Gen.listOfN(n, Gen.choose(0, 23))
  } yield Fixture((1 to n).map { i =>
    (i.toLong, s"User$i", statuses(i - 1), hours(i - 1), partitions(i % 2))
  })

  private val whereGen: Gen[String] = {
    val atom = Gen.oneOf(
      statusGen.map(s => s"status = '$s'"),
      Gen.choose(2, 5).map(k => s"id % $k = 0"),
      Gen.choose(3, 30).map(n => s"id <= $n"),
      Gen.choose(3, 30).map(n => s"id > $n"))
    Gen.oneOf(
      atom,
      for { a <- atom; b <- atom; op <- Gen.oneOf("AND", "OR") } yield s"($a) $op ($b)")
  }

  // optional [start, end) window; can span both fixture days
  private val windowGen: Gen[(Option[String], Option[String])] = for {
    useWindow <- Gen.prob(0.4)
    s <- Gen.choose(0, 23)
    len <- Gen.choose(1, 36)
  } yield
    if (!useWindow) (None, None)
    else {
      val start = java.time.LocalDateTime.of(2026, 1, 1, s, 0)
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      (Some(start.format(fmt)), Some(start.plusHours(len).format(fmt)))
    }

  /** Row timestamps carry their partition's encoded date — the naming
    * convention the coarse partition prune (C2) is entitled to assume.
    */
  private def dayOf(p: String): String = s"${p.take(4)}-${p.slice(4, 6)}-${p.drop(6)}"

  private def loadFixture(fx: Fixture): Unit =
    partitions.foreach { p =>
      val rows = fx.rows.filter(_._5 == p).map { case (id, name, status, hour, _) =>
        f"($id, '$name', '$status', TIMESTAMP '${dayOf(p)} $hour%02d:00:00')"
      }
      if (rows.nonEmpty)
        spark.sql(s"INSERT OVERWRITE TABLE $table PARTITION (partition_id='$p') " +
          s"VALUES ${rows.mkString(", ")}")
      else
        spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (partition_id='$p')")
    }

  test("deletion invariants hold for random predicates and fixtures") {
    forAll(fixtureGen, whereGen, windowGen) { (fx, where, window) =>
      loadFixture(fx)
      val b = DeletionCriteria.builder().whereClause(where)
      window._1.foreach(s => b.startTime(Timestamp.valueOf(s)))
      window._2.foreach(e => b.endTime(Timestamp.valueOf(e)))
      val criteria = b.build()
      val config = JobConfig(db, "prop_deletion_table", criteria,
        partitionParallelism = 1 + fx.rows.size % 3) // exercise batching too

      val before = spark.table(table).count()
      val pred = criteria.deletePredicate.get
      val expectedDeletedIds = spark.table(table).where(pred)
        .select("id").collect().map(_.getLong(0)).toSet
      val expectedRetainedIds = fx.rows.map(_._1).toSet -- expectedDeletedIds

      val affected = new PartitionHandler(spark, config).identifyAffectedPartitions()
      val result = new DeletionExecutor(spark, config, new Metrics).executeDeletion(affected)

      val retainedIds = spark.table(table).select("id").collect().map(_.getLong(0)).toSet
      val clue = s"where=[$where] window=$window rows=${fx.rows.size}"
      // 1. conservation
      assert(result.recordsDeleted + retainedIds.size == before, clue)
      // 2. completeness: no matching row survives
      assert(spark.table(table).where(pred).count() == 0, clue)
      // 3. soundness: exactly the non-matching rows survive
      assert(retainedIds == expectedRetainedIds, clue)
    }
  }
}

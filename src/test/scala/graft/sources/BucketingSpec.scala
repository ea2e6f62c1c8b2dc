package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Proof that bucketed writes buy exchange-free co-located joins — the
  * plan-shape guarantee the 100 TB story rests on.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark
  private val db = "bucketing_db"
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice", "l_discount"),
      s"$db.lineitem_b", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
      s"$db.orders_b", "l_orderkey", 8)
  }

  override def afterAll(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $db.lineitem_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.orders_b")
  }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("join of two same-bucketed tables plans with zero shuffle exchanges") {
    // disable broadcast so the join would otherwise be a shuffled SortMergeJoin
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = Bucketing.coLocatedJoin(spark, s"$db.lineitem_b", s"$db.orders_b", "l_orderkey")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"expected exchange-free co-located join, found:\n${joined.queryExecution.executedPlan}")
      // and it still computes the right thing
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val agg = spark.table(s"$db.lineitem_b")
        .groupBy("l_orderkey").agg(sum("l_extendedprice"))
      val exchanges = agg.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"groupBy on the bucket key must reuse bucketing:\n${agg.queryExecution.executedPlan}")
    }
  }
}

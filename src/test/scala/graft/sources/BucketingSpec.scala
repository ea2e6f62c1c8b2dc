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
  // isolated SQLConf: withConf flips broadcast/AQE settings that must not
  // leak into (or be disturbed by) concurrently-running suites
  private lazy val spark = SparkTestSession.isolated()
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

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // With AQE enabled a plan containing an exchange is wrapped in a leaf
  // AdaptiveSparkPlanExec and a naive collect over executedPlan finds
  // nothing — the assertion would be vacuously true. AQE is disabled for
  // the plan-shape checks (the negative control below proves the probe
  // actually detects exchanges).
  private def noBroadcastNoAqe[A](body: => A): A =
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")(body)

  private def countExchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

  test("join of two same-bucketed tables plans with zero shuffle exchanges") {
    noBroadcastNoAqe {
      val joined = Bucketing.coLocatedJoin(spark, s"$db.lineitem_b", s"$db.orders_b", "l_orderkey")
      assert(countExchanges(joined) === 0,
        s"expected exchange-free co-located join, found:\n${joined.queryExecution.executedPlan}")
      // negative control: the same join against a NON-bucketed side must
      // show exchanges, proving the probe detects them
      val unbucketed = spark.table(s"$db.lineitem_b").join(
        Tables.orders(spark, sfDir).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        "l_orderkey")
      assert(countExchanges(unbucketed) > 0, "probe failed to detect a real shuffle")
      // and it still computes the right thing
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    noBroadcastNoAqe {
      val agg = spark.table(s"$db.lineitem_b")
        .groupBy("l_orderkey").agg(sum("l_extendedprice"))
      assert(countExchanges(agg) === 0,
        s"groupBy on the bucket key must reuse bucketing:\n${agg.queryExecution.executedPlan}")
    }
  }
}

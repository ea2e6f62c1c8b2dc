package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

/** Binned interval join: result equals the naive non-equi join, and the
  * plan never degrades to a nested-loop/cartesian product — the binning
  * must restore a hash-joinable equi-key.
  */
class RangeJoinSpec extends AnyFunSuite {
  // isolated SQLConf: the plan-probe test flips AQE off, and suites run
  // concurrently in this JVM — the shared session must not see that
  private lazy val spark = SparkTestSession.isolated()
  private val sfDir = "/root/testdata/sf0.001"

  test("binned join result equals the naive BETWEEN join") {
    val got = RangeJoin.shipmentsInOrderWindows(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    // ground truth the slow way: driver-side nested loop over collected rows
    val intervals = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") >= 450000.0)
      .select(col("o_orderkey"), unix_timestamp(col("o_orderdate"))).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val points = Tables.lineitem(spark, sfDir)
      .select(unix_timestamp(col("l_shipdate")), col("l_quantity").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val week = 7L * 24 * 3600
    val want = intervals.flatMap { case (key, start) =>
      val hits = points.filter { case (t, _) => t >= start && t < start + week }
      if (hits.isEmpty) None
      else Some((key, hits.length.toLong, hits.map(_._2).sum))
    }.toSet
    assert(got === want)
  }

  test("plan has no nested-loop or cartesian join") {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan: SparkPlan =
      try RangeJoin.shipmentsInOrderWindows(spark, sfDir).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", old)
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      "binning must prevent BroadcastNestedLoopJoin")
    assert(plan.collect { case j: CartesianProductExec => j }.isEmpty)
  }

  test("every interval spans at most two bins") {
    // window length == bin width ⇒ the end-exclusive window touches ≤2 bins;
    // more would double-count points
    val binsPerInterval = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") >= 450000.0)
      .select(explode(sequence(
        floor(unix_timestamp(col("o_orderdate")) / (7L * 24 * 3600)),
        floor((unix_timestamp(col("o_orderdate") + expr("INTERVAL 7 DAYS")) - 1)
          / (7L * 24 * 3600)))).as("bin"), col("o_orderkey"))
      .groupBy("o_orderkey").count().agg(max("count")).first().getLong(0)
    assert(binsPerInterval <= 2)
  }
}

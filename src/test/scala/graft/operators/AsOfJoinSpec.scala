package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Semantics and plan shape of the as-of join: latest at-or-before match
  * per key, deterministic tiebreaks, null survival — and the structural
  * guarantee that makes it scale: NO theta-join anywhere in the plan.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the latest right row at-or-before each left timestamp, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L)
    ).toDF("user_id", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 11L, 1.0),
      (1L, ts("2024-01-01 10:00:00"), 12L, 2.0), // same instant as lid=100 → visible
      (1L, ts("2024-01-01 10:00:00"), 13L, 3.0), // tie: higher event_id wins
      (1L, ts("2024-01-01 11:00:00"), 14L, 4.0),
      (3L, ts("2024-01-01 08:00:00"), 31L, 5.0)  // other key: never leaks
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts",
        payload = Seq("event_id", "value"), tiebreak = "event_id")
      .select("lid", "asof_event_id", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out === Set(
      (100L, Some(13L), Some(3.0)), // same-instant right row visible, max tie wins
      (101L, Some(14L), Some(4.0)), // latest before 12:00
      (200L, None, None)))          // no right row for key 2 → nulls survive
  }

  test("plan is union + window: no nested-loop/cartesian join, one key shuffle") {
    // AQE must be OFF for this probe: with it on, executedPlan is a leaf
    // AdaptiveSparkPlanExec that hides all children and the assertions pass
    // vacuously (the PlanShapeSpec pitfall). Isolated session so the flip
    // cannot race concurrently-running suites.
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val q = AsOfJoin.eventsAsOf(s, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan
    // positive control: the probe sees through the plan (a window exists)
    assert(plan.collectWithSubqueries {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }.nonEmpty)
    assert(plan.collectWithSubqueries { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
    assert(plan.collectWithSubqueries { case j: CartesianProductExec => j }.isEmpty)
  }

  test("a NULL field in the latest right row stays NULL (no cross-row backfill)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 100L)).toDF("user_id", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 11L, Some(7.0)),
      (1L, ts("2024-01-01 11:00:00"), 12L, None) // latest: value is NULL
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts",
        payload = Seq("event_id", "value"), tiebreak = "event_id")
      .select("asof_event_id", "asof_value").first()
    assert(out.getLong(0) === 12L)
    assert(out.isNullAt(1), "latest right row's NULL field must not be backfilled from an older row")
  }

  test("events as-of join: every wait_sec is non-negative, purchases conserved") {
    val out = AsOfJoin.eventsAsOf(spark, "/root/testdata/sf0.001").cache()
    val nPurchases = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_type") === "purchase").count()
    assert(out.count() === nPurchases)
    assert(out.where(col("wait_sec") < 0).count() === 0)
    // a matched click is a real click event of the same user
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"))
    val phantom = out.where(col("click_id").isNotNull)
      .join(ev, Seq("click_id", "user_id"), "left_anti").count()
    assert(phantom === 0)
  }
}

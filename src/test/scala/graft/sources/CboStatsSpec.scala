package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Sidecar-derived CBO statistics: with `spark.sql.cbo.enabled`, graft
  * relations report row count, bytes, bounds and an integral-span NDV
  * bound from the manifest sidecars (metadata only — no ANALYZE, no
  * scan), so the cost-based optimizer's join reorder treats them like
  * ANALYZE'd catalog tables. Reference context: the reference engine
  * reads Hive metastore stats implicitly; this is that idea over the
  * manifest's own sidecars.
  */
class CboStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  private def mk(name: String, df: org.apache.spark.sql.DataFrame,
      part: String): String = {
    val dir = Files.createTempDirectory(s"graft-cbo-$name").toString
    VersionedTable.create(df, dir, part)
    dir
  }

  test("row count and column bounds surface in the optimized plan's " +
      "statistics; a 3-table join reorders so the small table joins " +
      "first") {
    val n = 20000L
    val big1 = mk("b1", spark.range(n)
      .select(col("id").as("bid"), (col("id") % 97).as("x"),
        (col("id") % 2).cast("string").as("p1")), "p1")
    val big2 = mk("b2", spark.range(n)
      .select(col("id").as("b2id"), (col("id") % 97).as("x2"),
        (col("id") % 2).cast("string").as("p2")), "p2")
    val small = mk("s", spark.range(10)
      .select(col("id").as("sid"), lit("t").as("tag"),
        lit("z").as("p3")), "p3")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // syntactic order: (big1 ⋈ big2) ⋈ small — the worst order (the
      // x-join explodes ~n²/97 rows before small cuts them to ≤10)
      val q = spark.sql(
        s"""SELECT b.bid, c.b2id, s.tag
           |FROM graft.`$big1` b
           |JOIN graft.`$big2` c ON b.x = c.x2
           |JOIN graft.`$small` s ON b.bid = s.sid""".stripMargin)
      val opt = q.queryExecution.optimizedPlan
      // 1. stats wired: every graft relation reports its exact row
      // count from the sidecars
      val rels = opt.collect { case lr: LogicalRelation => lr }
      assert(rels.size === 3)
      val counts = rels.flatMap(_.stats.rowCount).map(_.toLong).sorted
      assert(counts === Seq(10L, n, n), s"row counts: $counts")
      // bounds + the integral-span NDV bound ride along
      val attrStats = rels.flatMap(_.stats.attributeStats.values)
      assert(attrStats.exists(_.distinctCount.isDefined),
        "some column must carry an NDV bound")
      // 2. the reorder: the DEEPEST join must involve the small table
      // (its output carries sid/tag), pushing the exploding x-join up
      val joins = opt.collect { case j: Join => j }
      assert(joins.size === 2, opt.treeString)
      val deepest = joins.last // collect is pre-order; last = innermost
      val deepNames = deepest.output.map(_.name).toSet
      assert(deepNames.contains("sid") || deepNames.contains("tag"),
        s"small table must join first, got:\n${opt.treeString}")
      // 3. and the answer is right
      assert(q.count() === 10L * (n / 97 + 1))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("CBO off: plans pass through with size-only stats (no catalog " +
      "table attached)") {
    val dir = mk("plain", spark.range(100)
      .select(col("id"), (col("id") % 2).cast("string").as("p")), "p")
    val opt = spark.sql(s"SELECT * FROM graft.`$dir`")
      .queryExecution.optimizedPlan
    val rels = opt.collect { case lr: LogicalRelation => lr }
    assert(rels.nonEmpty)
    assert(rels.forall(_.catalogTable.isEmpty))
    assert(rels.forall(_.stats.sizeInBytes > 0))
  }
}

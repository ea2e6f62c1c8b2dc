package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Salted join/agg must change WHERE rows meet, never WHICH rows match. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 10k rows, 90% on one hot key — the distribution that single-reducers a
  // plain shuffle join
  private lazy val big = (1 to 10000)
    .map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong))
    .toDF("k", "payload")
  private lazy val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (6L, "c"), (9L, "unmatched"))
    .toDF("k", "name")

  test("saltedJoin output equals the unsalted join exactly") {
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8)
      .select("k", "payload", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedJoin left-outer keeps unmatched big rows once") {
    val plain = big.join(small, Seq("k"), "left").select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "k", buckets = 4, joinType = "left")
      .select("k", "payload", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("salt actually spreads the hot key across buckets") {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)).cast("int"))
    val spread = bigSalted.where(col("k") === 0L).select("__salt").distinct().count()
    assert(spread === 8L, "hot key must occupy every salt bucket")
  }

  test("saltedJoin rejects join types the salt construction cannot preserve") {
    // right/full-outer would emit each unmatched small row once per replica
    for (jt <- Seq("right", "full", "full_outer")) {
      val ex = intercept[IllegalArgumentException] {
        Skew.saltedJoin(big, small, "k", buckets = 4, joinType = jt)
      }
      assert(ex.getMessage.contains("salt replica"), jt)
    }
  }

  test("heavy variant plan: SORT-MERGE join on the salted key, no broadcast") {
    // the load-bearing regime: the profile side is hinted off broadcast
    // (standing in for a side above the threshold), so without the salt
    // this would be a skewed SMJ with ~50% of rows on one reducer
    val s2 = graft.testkit.SparkTestSession.isolated()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = graft.operators.Analytics
      .eventsSaltedJoinHeavy(s2, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val smjLines = plan.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(smjLines.exists(_.contains("__salt")),
      s"the join must be a sort-merge on (key, __salt):\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"the profile side must not broadcast (that is the point):\n$plan")
  }

  test("heavy variant equals its unsalted form exactly") {
    val out = graft.operators.Analytics
      .eventsSaltedJoinHeavy(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq("cold", "hot"))
    val hot = out.find(_._1 == "hot").get
    val cold = out.find(_._1 == "cold").get
    // the hot tier is the collapsed user-0 key: exactly one user holding
    // roughly half of all events — the skew the salt spreads
    assert(hot._3 === 1L, "hot tier must be the single collapsed key")
    assert(hot._2 > cold._2 / 4, "hot key must carry a comparable share")
  }

  test("saltedAgg collect_set matches the direct holistic aggregate") {
    val direct = big.groupBy("k")
      .agg(array_sort(collect_set(col("payload"))).as("vals"))
    val salted = Skew.saltedAgg(big, "k", buckets = 8,
        stage1 = collect_set, stage2 = c => array_sort(array_distinct(flatten(collect_list(c)))),
        valueCol = "payload", outName = "vals")
    assert(salted.count() === direct.count())
    assert(salted.exceptAll(direct).count() === 0)
  }
}

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

  test("AQE splits raw-shuffle skew but CANNOT fix the aggregate-fed join salting covers") {
    // the division of labor in the skew story, pinned live: AQE's
    // skew-join splits an oversized partition only when BOTH SMJ inputs
    // are raw shuffle stages; when one side is an aggregate over the
    // same key — joining facts to a per-key profile, exactly the
    // events_salted_join_heavy shape — the aggregate sits between the
    // join and the shuffle stage and AQE must leave the hot partition
    // whole. Salting is the fix there, not a redundant alternative.
    val s2 = graft.testkit.SparkTestSession.isolated()
    import s2.implicits._
    import org.apache.spark.sql.functions.{col, count => cnt, lit, when}
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // a skewed reduce partition splits along MAPPER boundaries — the
    // fixture is one single-row-group parquet file, i.e. ONE effective
    // mapper, which leaves AQE nothing to split along; the round-robin
    // repartition stands in for the many map tasks a real fact table has
    val ev = graft.sources.Tables.events(s2, "/root/testdata/sf0.1").select(
      when(col("user_id") % 10 < 5, 0L).otherwise(col("user_id")).as("hot_user"),
      col("value")).repartition(8)
    // case 1: raw two-table join (the dim is a plain relation, so both
    // SMJ inputs are shuffle stages) -> AQE splits the hot partition
    val userIds = ev.select("hot_user").distinct()
      .collect().map(_.getLong(0)).toSeq
    val dim = userIds.map(u => (u, s"u$u")).toDF("hot_user", "name")
    val raw = ev.join(dim, "hot_user")
    assert(raw.collect().length === 100000)
    val rawPlan = raw.queryExecution.executedPlan
    assert(graft.operators.Analytics.planHasSkewJoin(rawPlan),
      s"AQE must skew-split the raw hot-key SMJ:\n${rawPlan.toString.take(3000)}")
    // case 2: the profile side is an AGGREGATE over the same key -> the
    // hot partition stays whole (no skew=true anywhere) even though the
    // same skew is present — beyond AQE's reach, salting's territory
    val profile = ev.groupBy("hot_user").agg(cnt(lit(1)).as("n_user_events"))
    val agg = ev.join(profile, "hot_user")
    assert(agg.collect().length === 100000)
    val aggPlan = agg.queryExecution.executedPlan
    assert(aggPlan.toString.contains("isFinalPlan=true"))
    assert(!graft.operators.Analytics.planHasSkewJoin(aggPlan),
      "if AQE learns to split aggregate-fed joins, revisit whether " +
        "events_salted_join_heavy still needs the salt")
  }

  test("events_aqe_skew_join: the adaptive plan splits the hot partition and equals the salted form") {
    val sfDir = "/root/testdata/sf0.001"
    val aqe = graft.operators.Analytics.eventsAqeSkewJoin(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    // the in-row plan audit: the skew split MUST have fired (the entry
    // reads its own executed adaptive plan)
    assert(aqe.forall(_._5), s"skew split did not fire: $aqe")
    val salted = graft.operators.Analytics
      .eventsSaltedJoinHeavy(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(aqe.map(t => (t._1, t._2, t._3, t._4)) === salted,
      "AQE-mitigated and salt-mitigated joins must agree exactly")
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

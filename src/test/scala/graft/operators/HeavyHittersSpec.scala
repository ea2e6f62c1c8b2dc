package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Two-pass heavy hitters: the Misra–Gries summary must keep every key
  * above its partition's n/k (the superset guarantee the pigeonhole
  * argument needs), and the end-to-end result must equal the plain
  * GROUP BY answer REGARDLESS of how the input is partitioned — sketch
  * internals may widen the candidate set, never change the output.
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("Misra-Gries keeps every key with count > n/k") {
    // 100 of key 1, 60 of key 2, singletons 1000..1199: n = 360
    val data = Seq.fill(100)(1L) ++ Seq.fill(60)(2L) ++
      (1000L until 1200L)
    for (k <- Seq(4, 8, 32)) {
      val survivors = HeavyHitters
        .misraGries(new scala.util.Random(42).shuffle(data).iterator, k).toSet
      val thr = data.size.toDouble / k
      val mustKeep = data.groupBy(identity).collect {
        case (key, occ) if occ.size > thr => key
      }.toSet
      assert(mustKeep.subsetOf(survivors),
        s"k=$k lost guaranteed keys ${mustKeep -- survivors}")
      assert(survivors.size <= k - 1, s"k=$k kept more than k-1 counters")
    }
  }

  test("result equals the exact GROUP BY answer for every partitioning") {
    import spark.implicits._
    // skewed: key i appears 2^(8-i) times for i in 0..8, plus noise keys
    val rows = (0L to 8L).flatMap(i => Seq.fill(1 << (8 - i).toInt)(i)) ++
      (100L until 400L)
    val n = rows.size
    val k = 16
    val want = rows.groupBy(identity)
      .collect { case (key, occ) if occ.size.toLong * k > n =>
        (key, occ.size.toLong, n.toLong)
      }.toSet
    assert(want.nonEmpty, "test data must contain heavy hitters")
    for (parts <- Seq(1, 3, 32)) {
      val df = spark.createDataset(rows).repartition(parts).toDF("user_id")
      val got = HeavyHitters.heavyHittersFor(df, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"partitions=$parts")
    }
  }

  test("gated entry: exactly the 7 planted hot keys, exact counts") {
    import org.apache.spark.sql.functions._
    val df = HeavyHitters.userHeavyHitters(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    // the 7 planted hot keys always qualify (at tiny sf the 15-user cold
    // tail ALSO clears n/100 — the exact cross-check below is the contract)
    assert((0L until 7L).toSet.subsetOf(rows.map(_.getLong(0)).toSet),
      "the derived skew plants hot keys 0..6")
    // exact cross-check against a plain groupBy over the same skewed key
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(when(col("event_id") % 2 === 0, col("user_id") % 7)
        .otherwise(col("user_id") + 10000L).as("user_id"))
    val n = ev.count()
    val want = ev.groupBy("user_id").count()
      .where(col("count") * 100 > n)
      .collect().map(r => (r.getLong(0), r.getLong(1), n)).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === want)
  }
}

package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

/** Accuracy bounds for the sketch aggregates that replace exact forms at
  * 100 TB: `approx_count_distinct` (HyperLogLog++) for distinct counts and
  * `approx_percentile` (t-digest-style quantile summary) for percentiles.
  * Both are partial-aggregable — they merge across partitions map-side, so
  * a skewed or huge group costs O(sketch size), not O(group size) — which
  * is exactly what the exact forms (sort-within-group percentiles, full
  * distinct shuffles) cannot do at scale. These specs pin the error the
  * swap introduces on real data; the exact forms stay the oracle-checked
  * query contracts.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("events_approx_profile surface query: every per-day sketch bound holds (all SFs)") {
    // the first-class sketch entry's contract: HLL estimate within 5% of
    // exact distinct users per day, approx median inside the exact IQR —
    // the same booleans the DuckDB oracle pins to TRUE; verified here at
    // every scale factor the driver exercises
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val df = graft.operators.Analytics.eventsApproxProfile(spark, s"/root/testdata/$sf")
      val bad = df.where(!col("hll_within_5pct") || !col("p50_within_iqr")).count()
      assert(bad === 0, s"$sf: $bad day rows violate a sketch bound")
    }
  }

  test("approx_count_distinct is within its rsd bound of the exact distinct count") {
    val docs = Tables.documents(spark, sfDir)
    val row = docs.agg(
      countDistinct(col("text")).as("exact"),
      approx_count_distinct(col("text"), rsd = 0.05).as("approx")).first()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    // 0.05 rsd ⇒ ~3σ bound of 15%; deterministic for a fixed input
    assert(math.abs(approx - exact) / exact <= 0.15,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile tracks the exact percentile per language group") {
    val joined = Tables.documents(spark, sfDir)
      .groupBy("lang")
      .agg(
        percentile(col("n_chars"), lit(0.5)).as("exact_p50"),
        approx_percentile(col("n_chars"), lit(0.5), lit(1000)).as("approx_p50"))
      .withColumn("rel_err",
        abs(col("approx_p50") - col("exact_p50")) / col("exact_p50"))
    assert(joined.where(col("rel_err") > 0.05).count() === 0,
      joined.collect().mkString("\n"))
  }
}

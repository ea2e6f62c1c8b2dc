package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Non-equi interval join via BINNING — the standard trick for making a
  * point-in-range join scale (cf. the bucketed range-join optimizations in
  * the open-source engines: Spark's own storage-partitioned range joins,
  * Flink interval joins, the Databricks range-join hint).
  *
  * A naive `points JOIN intervals ON p BETWEEN s AND e` has no equi-key, so
  * Spark plans BroadcastNestedLoopJoin — O(points × intervals) comparisons
  * and a driver-sized broadcast of one side; at 100 TB it never finishes.
  * Binning restores an equi-key: choose bin width = the (fixed) interval
  * length W, map each point to `floor(t / W)` (exactly one bin) and each
  * interval to the ≤2 bins it overlaps, hash-join on the bin id, then
  * verify the exact bounds. Shuffle is O(points + 2·intervals); every
  * candidate pair shares a bin, and each true pair is produced exactly once
  * (the point's single bin is one of the interval's two).
  *
  * Fixture: "fulfilment-window shipment load" — for each high-value urgent
  * order, how many lineitems (any order) shipped corpus-wide during its
  * 7-day window `[o_orderdate, o_orderdate + 7d)`. Both sides are
  * data-proportional (intervals are a filtered scan of `orders`, points are
  * all of `lineitem`), so nothing here relies on one side being tiny.
  */
object RangeJoin {

  private val WindowDays = 7

  /** Bin index from TZ-proof DAY arithmetic: `datediff` counts calendar
    * days between DATE values, so a bin is exactly [[WindowDays]] days in
    * every session timezone. (The previous `unix_timestamp(date)/604800`
    * form was second-based and session-TZ-dependent: under a DST-observing
    * TZ some "weeks" are 7d±1h of seconds, which breaks the ≤2-bins-per-
    * interval invariant the join's exactly-once pairing rests on.)
    */
  private def bin(d: Column): Column =
    floor(datediff(d, to_date(lit("1970-01-01"))) / WindowDays)

  /** Per-interval aggregate over the binned join. `sum_qty` sums
    * integer-valued quantities cast to long — order-free, oracle-exact.
    */
  def shipmentsInOrderWindows(spark: SparkSession, sfDir: String,
      priceFloor: Double = 450000.0): DataFrame = {
    val intervals = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") >= priceFloor)
      .select(col("o_orderkey"), col("o_orderdate").as("w_start"),
        (col("o_orderdate") + expr(s"INTERVAL $WindowDays DAYS")).as("w_end"))
    // ≤2 bins per interval: the window length equals the bin width, so the
    // end-exclusive window touches the start bin and at most one successor
    val binned = intervals.select(col("o_orderkey"), col("w_start"), col("w_end"),
      explode(sequence(
        bin(col("w_start")),
        bin(date_sub(col("w_end"), 1)))).as("bin"))
    val points = Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate"), col("l_quantity").cast("long").as("qty"),
        bin(col("l_shipdate")).as("bin"))
    points.join(binned, "bin")
      .where(col("l_shipdate") >= col("w_start") && col("l_shipdate") < col("w_end"))
      .groupBy(col("o_orderkey"), col("w_start"))
      .agg(count(lit(1)).as("n_shipments"), sum(col("qty")).as("sum_qty"))
      .select(col("o_orderkey"), col("w_start"), col("n_shipments"), col("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** The oracle states the SEMANTICS (plain BETWEEN-style join) — the
    * binning is a plan-level rewrite the hash gate proves equivalent.
    */
  def shipmentsInOrderWindowsSql(priceFloor: Double = 450000.0): String =
    s"""WITH intervals AS (
       |  SELECT o_orderkey, o_orderdate AS w_start,
       |    o_orderdate + INTERVAL $WindowDays DAY AS w_end
       |  FROM orders
       |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice >= $priceFloor)
       |SELECT o_orderkey, w_start,
       |  count(*) AS n_shipments,
       |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       |FROM intervals JOIN lineitem
       |  ON l_shipdate >= w_start AND l_shipdate < w_end
       |GROUP BY 1, 2 ORDER BY o_orderkey""".stripMargin
}

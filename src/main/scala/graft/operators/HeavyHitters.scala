package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Exact heavy hitters in two passes via per-partition Misra–Gries
  * candidate generation — the pattern that finds every key with global
  * frequency > n/k WITHOUT a full-key-space `groupBy`.
  *
  * Pass 1 runs the Misra–Gries summary (k−1 counters, decrement-all on
  * overflow) independently inside each partition: every key with
  * partition count > n_p/k survives its partition's summary. By
  * pigeonhole, a key with GLOBAL count > n/k = Σ n_p/k must exceed
  * n_p/k in at least one partition, so the union of per-partition
  * survivors is a guaranteed superset of the true heavy hitters — at
  * most `partitions × (k−1)` ids, collected to the driver as a bounded
  * candidate list. Pass 2 broadcast-semi-joins that list back and counts
  * ONLY the candidates exactly, then keeps `count·k > n` (strict > n/k,
  * in integer arithmetic so both engines agree).
  *
  * Scale shape: pass 1 is map-only (no shuffle at all — summaries never
  * merge, their union is collected); pass 2 shuffles partial counts for
  * ≤ partitions×k keys instead of every distinct key. On a 100 TB fact
  * with billions of distinct users that is the difference between a
  * bounded-width aggregate and a corpus-wide one. The final result is a
  * pure function of the data — sketch internals (partition layout,
  * merge order) only ever widen the candidate superset, never change
  * the output — which is what lets a plain GROUP BY/HAVING oracle
  * hash-gate a sketch-driven plan.
  */
object HeavyHitters {

  /** Misra–Gries over one partition: returns the surviving keys
    * (every key with count > n_p/k is guaranteed to survive).
    */
  private[graft] def misraGries(it: Iterator[Long], k: Int): Iterator[Long] = {
    val counters = mutable.LongMap.empty[Long]
    it.foreach { x =>
      if (counters.contains(x)) counters(x) += 1L
      else if (counters.size < k - 1) counters(x) = 1L
      else {
        // decrement-all; drop zeros (amortized O(1) per input element)
        val keys = counters.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val v = counters(keys(i))
          if (v == 1L) counters.remove(keys(i)) else counters(keys(i)) = v - 1L
          i += 1
        }
      }
    }
    counters.keysIterator.toList.iterator
  }

  /** Keys with strictly more than n/k of all events, exact counts.
    *
    * The shipped events table is near-uniform (every user within ~1.3×
    * of the mean), so raw `user_id` has NO heavy hitters at bench scale
    * — the entry would gate a vacuous empty result. Instead it derives
    * the same deterministic hot-key skew `events_salted_join_heavy`
    * uses: every even event collapses onto one of 7 hot keys, odd
    * events stay spread across the (offset) user space. That plants
    * exactly 7 true heavy hitters (~n/14 each > n/100) at EVERY scale
    * factor while the cold tail stays far below threshold — the shape
    * the sketch exists for, expressed identically in the oracle.
    */
  def userHeavyHitters(spark: SparkSession, sfDir: String, k: Int = 100): DataFrame = {
    val skewed = Tables.events(spark, sfDir).select(
      when(col("event_id") % 2 === 0, col("user_id") % 7)
        .otherwise(col("user_id") + 10000L).as("user_id"))
    heavyHittersFor(skewed, k)
  }

  /** The two-pass engine over any single-LongType-column frame —
    * injectable so the spec can plant skew and vary partitioning.
    */
  def heavyHittersFor(keys: DataFrame, k: Int): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val ev = keys.toDF("user_id")
    val n = ev.count()
    // pass 1: map-only candidate superset, bounded by partitions × (k−1)
    val candidates = ev.as[Long]
      .mapPartitions(it => misraGries(it, k))
      .distinct().collect()
    val candDf = candidates.toSeq.toDF("cand_id")
    // pass 2: exact counts over candidates only
    ev.join(broadcast(candDf), col("user_id") === col("cand_id"), "left_semi")
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("cnt"))
      .where(col("cnt") * k > n)
      .withColumn("total", lit(n))
      .orderBy("user_id")
  }

  def userHeavyHittersSql(k: Int = 100): String =
    s"""WITH sk AS (
       |  SELECT CASE WHEN event_id % 2 = 0 THEN user_id % 7
       |              ELSE user_id + 10000 END AS user_id
       |  FROM events),
       |t AS (SELECT count(*) AS n FROM sk)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
       |       CAST(t.n AS BIGINT) AS total
       |FROM sk CROSS JOIN t
       |GROUP BY user_id, t.n
       |HAVING count(*) * $k > t.n
       |ORDER BY user_id""".stripMargin
}

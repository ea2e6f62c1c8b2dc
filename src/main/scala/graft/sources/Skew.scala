package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * A shuffled equi-join hashes each key to one reducer, so one hot key
  * (the null-ish tenant, the default user, the empty-string bucket) drags
  * its entire row population through a single task — the classic straggler
  * that stalls a 1000-executor job on one core. AQE's skew-join splitting
  * handles the sort-merge case after the fact; salting fixes the
  * distribution up front, works for any join the optimizer picks, and is
  * the only option when the skewed side must also aggregate afterwards.
  *
  * Note what does NOT need salting in Spark: algebraic grouped aggregates
  * (sum/count/min/max/avg) — partial aggregation pre-reduces hot keys
  * map-side, so each mapper emits one row per key regardless of skew.
  * Salt joins, not aggregations, unless the aggregate is holistic
  * (collect_list and friends).
  */
object Skew {

  /** Equi-join `big` (skew-prone) with `small` on `key`, spreading each of
    * big's keys over `buckets` reducers: big rows get a deterministic salt
    * in [0, buckets), small rows are replicated once per salt value, and
    * the join key becomes (key, salt). Output rows are exactly those of
    * the unsalted join (the salt never changes WHICH rows match — only
    * where they meet); replication multiplies only the SMALL side, by
    * `buckets`.
    *
    * The salt is a hash of the big side's whole row (xxhash64), not a
    * random number: deterministic across retries/speculative tasks, and
    * uniform even when the hot key's rows are otherwise identical in a
    * few columns.
    */
  /** Join types the salt construction preserves: unmatched BIG rows appear
    * once (they carry one salt), but an unmatched SMALL row exists in
    * `buckets` replicas — right/full-outer would emit it `buckets` times.
    */
  private val SafeJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi",
      "leftanti", "left_anti", "cross")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin preserves inner/left-variant joins only; '$joinType' would " +
        s"emit unmatched small-side rows once per salt replica")
    val bigCols = big.columns.map(col)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(bigCols: _*)), lit(buckets)).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Grouped holistic aggregation with salt: two-stage
    * groupBy(key, salt) → groupBy(key), for aggregates partial
    * aggregation cannot pre-reduce (collect_list/set-shaped). The caller
    * supplies both stages, e.g. stage 1 `collect_set(x)`, stage 2
    * `array_distinct(flatten(collect_list(...)))`.
    */
  def saltedAgg(df: DataFrame, key: String, buckets: Int,
      stage1: Column => Column, stage2: Column => Column,
      valueCol: String, outName: String): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(buckets)).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(stage1(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(stage2(col("__partial")).as(outName))
  }
}

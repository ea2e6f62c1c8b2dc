package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashes
import graft.sources.Tables

/** Compute-weighted parallel-scaling probe (round-16 verdict item #2:
  * the driver's 8-vs-32-core comparison read ≈1 on every entry because
  * the whole surface is fixed-overhead bound at the bench scale factor,
  * so parallel scaling was undemonstrable).
  *
  * The probe is an embarrassingly parallel CPU-bound aggregate whose
  * per-row work is a [[ChainSteps]]-step arithmetic hash chain — the
  * [[Hashes]] affine recurrence with the step index as the additive
  * term, expressed as the SAME interpreted fold in both engines
  * (Spark `aggregate` HOF ≡ DuckDB `list_reduce`), so the oracle
  * reproduces it bit-for-bit and neither engine can constant-fold it
  * away (the fold is data-dependent at every step).
  *
  * The output GROUPS BY a key derived from the chain value (`h % 16`).
  * That is not decoration: the bench times `.count()`, and a global
  * aggregate's row count is independent of its aggregate expressions —
  * the optimizer prunes the whole chain and the "probe" measures a bare
  * scan (measured: identical wall at 512 and 4096 steps). With the
  * chain feeding the grouping key, pruning is impossible and every row
  * pays the fold (guide §1.4's count()-prunes-subtrees warning, hit in
  * the first draft of this probe).
  *
  * The scan is spread over `defaultParallelism` partitions (the bench
  * SF's lineitem is one ~11 MB parquet file = one input split —
  * without the spread the probe would measure one core at every core
  * count). `defaultParallelism` is scale-adaptive by definition: it is
  * the session's core count locally and the executor-core total on a
  * cluster.
  */
object ScalingProbe {

  /** Steps per row: sized so the bench-SF probe carries tens of
    * core-seconds of genuine compute — enough that halving the cores
    * visibly doubles the wall — while the oracle at the correctness
    * SFs stays seconds-cheap (~0.3 s at sf0.001, ~2.8 s at sf0.01 in
    * DuckDB).
    */
  val ChainSteps = 1024

  /** Buckets in the output census — small enough that the shuffle is
    * metadata-sized (partial aggregation reduces each scan partition to
    * [[Buckets]] rows), large enough to pin the full chain value range.
    */
  val Buckets = 16L

  def hashChain(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Hashes.Prime
    val seed = ((col("l_orderkey") % p) * lit(131L) +
      col("l_linenumber").cast("long")) % p
    Tables.lineitem(spark, sfDir)
      .select(seed.as("h0"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(aggregate(
        sequence(lit(1L), lit(ChainSteps.toLong)),
        col("h0"),
        (acc, i) => (acc * lit(131L) + i) % p).as("h"))
      .groupBy((col("h") % Buckets).as("bucket"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("h")).cast("long").as("sum_h"),
        min(col("h")).cast("long").as("min_h"),
        max(col("h")).cast("long").as("max_h"))
      .orderBy("bucket")
  }

  def hashChainSql(): String =
    s"""SELECT h % $Buckets AS bucket, count(*) AS n,
       |       CAST(sum(h) AS BIGINT) AS sum_h,
       |       CAST(min(h) AS BIGINT) AS min_h,
       |       CAST(max(h) AS BIGINT) AS max_h
       |FROM (
       |  SELECT list_reduce(
       |    list_prepend(
       |      CAST((l_orderkey % ${Hashes.Prime}) * 131 + l_linenumber AS BIGINT)
       |        % ${Hashes.Prime},
       |      list_transform(generate_series(1, $ChainSteps),
       |        i -> CAST(i AS BIGINT))),
       |    (acc, i) -> (acc * 131 + i) % ${Hashes.Prime}) AS h
       |  FROM lineitem)
       |GROUP BY 1 ORDER BY 1""".stripMargin
}

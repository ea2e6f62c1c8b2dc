package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequence packing — the GPT-style training-batch layout: conceptually
  * concatenate every document's tokens in doc_id order into one stream and
  * cut it every `capacity` tokens; each document is assigned the bin its
  * first token lands in (`bin_id = start_offset / capacity`). Downstream,
  * one bin = one training row; documents spanning a cut are split by the
  * tokenizer at materialization time — the layout decision (this operator)
  * only needs each doc's global start offset.
  *
  * The start offset is a GLOBAL prefix sum — the textbook case of "needs
  * a global ordering" that does NOT need a global single-task window.
  * Scale shape (two-phase distributed prefix sum):
  *   1. range-partition by doc_id and sort within partitions — each
  *      partition holds a contiguous doc_id range;
  *   2. per-partition token totals to the driver (ONE number per
  *      partition — metadata-sized regardless of corpus size) → exclusive
  *      prefix offsets per partition;
  *   3. one map pass: local running sum + the partition's offset.
  * Output is independent of where the range boundaries fall, so the
  * range partitioner's sampling cannot perturb results. The oracle states
  * the semantics as a plain cumulative-sum window; the hash gate proves
  * the two-phase plan equivalent.
  */
object Packing {

  val DefaultCapacity = 256

  /** (doc_id, n_tokens, start_offset, bin_id) in doc_id order. */
  def packBins(spark: SparkSession, sfDir: String,
      capacity: Int = DefaultCapacity): DataFrame =
    packBinsOf(Tables.documents(spark, sfDir), capacity)

  /** [[packBins]] over any (doc_id, text) frame. */
  def packBinsOf(docs: DataFrame, capacity: Int = DefaultCapacity): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    // two passes over the same frame (per-partition totals, then offset
    // assignment) WITHOUT caching — a .cache() here would leak a pinned
    // corpus-sized dataset per call (nothing can unpersist it after the
    // lazy result is returned). Re-execution is safe because both passes
    // see identical partitioning: the range partitioner samples with
    // partition-id-derived seeds (deterministic for the same input), and
    // the explicit partition count keeps AQE from re-coalescing between
    // executions.
    val nRange = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .repartitionByRange(nRange, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
      .rdd
    val out = withOffsets(base, nRange, baseOffset = 0L)
      .map { case (id, n, start) => (id, n, start, start / capacity) }
      .toDF("doc_id", "n_tokens", "start_offset", "bin_id")
    out.orderBy("doc_id")
  }

  /** The two-phase distributed exclusive prefix sum over an already
    * range-partitioned, within-partition-sorted `(payload, count)` RDD —
    * shared by [[packBinsOf]] and [[Manifest]] so the partition-id
    * discipline lives in ONE place: per-partition totals to the driver
    * (one long each), exclusive offsets per partition, one local running
    * sum pass. Both passes use `mapPartitionsWithIndex`, whose index is
    * the RDD's OWN partition id — `TaskContext.getPartitionId` is the
    * STAGE-wide task index, which shifts when a downstream union fuses
    * the plan after another leg (Manifest.extendManifest hit exactly
    * that as `key not found` on the union's second leg).
    */
  private[pipeline] def withOffsets[T](
      rdd: org.apache.spark.rdd.RDD[(T, Long)], nRange: Int,
      baseOffset: Long)(implicit ct: scala.reflect.ClassTag[T])
      : org.apache.spark.rdd.RDD[(T, Long, Long)] = {
    val partTotals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator((pid, s))
    }.collect().toMap
    // exclusive prefix offsets: partition p starts after all tokens of
    // 0..p-1 (the range exchange may produce fewer than nRange partitions
    // on small inputs — absent ids contribute 0 and never appear in tasks)
    var acc = baseOffset
    val offsetByPart = (0 until nRange).map { p =>
      val start = acc; acc += partTotals.getOrElse(p, 0L); p -> start
    }.toMap
    rdd.mapPartitionsWithIndex { (pid, it) =>
      var off = offsetByPart(pid)
      it.map { case (t, n) =>
        val start = off; off += n
        (t, n, start)
      }
    }
  }

  /** DuckDB oracle — the semantics as an exclusive cumulative sum. */
  def packBinsSql(capacity: Int = DefaultCapacity): String =
    s"""WITH n AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
       |  FROM n)
       |SELECT doc_id, n_tokens, start_offset, start_offset // $capacity AS bin_id
       |FROM c ORDER BY doc_id""".stripMargin
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Range-clustered data layout — the write-side half of scan pruning at
  * 100 TB: range-partition on the filter column and sort within each file,
  * so every output file covers a DISJOINT value range. A later scan with a
  * predicate on that column pushes the filter into parquet
  * (`PushedFilters` on the scan) and every non-matching file is skipped at
  * the row-group level via footer min/max stats — the scan's I/O is
  * proportional to the selected range, not the table.
  *
  * This is the same layout decision a partitioned-by-date table makes for
  * its partition column, generalized to high-cardinality columns where a
  * directory per value is infeasible (ids, timestamps) — one range-write
  * amortizes over every subsequent selective scan. LayoutSpec proves the
  * disjoint per-file ranges and the pushed filter.
  */
object Layout {

  /** Write `df` range-clustered on `orderCol` into `numFiles` files. */
  def writeRangeLayout(df: DataFrame, path: String, orderCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Z-value (Morton code) of two non-negative long columns: quantize each
    * to `bits` bits against its [min, max] domain, then interleave the
    * bits. Pure 64-bit Column arithmetic — the per-bit shifts unroll into
    * one codegen'd expression, no UDF.
    */
  def zValue(x: Column, y: Column, xMin: Column, xMax: Column,
      yMin: Column, yMax: Column, bits: Int = 16): Column =
    zValueN(Seq(x, y), Seq(xMin, yMin), Seq(xMax, yMax), bits)

  /** N-column Morton code (Delta accepts any ZORDER arity; 3–4 column
    * z-maps are common on event tables): quantize each column to `bits`
    * bits against its [min, max] domain, then interleave round-robin —
    * bit `b` of column `i` lands at position `b*n + (n-1-i)`, so the
    * FIRST listed column takes the most significant bit of each round
    * (for n=2 this is exactly the classic x-odd/y-even interleave).
    * Pure 64-bit Column arithmetic, unrolled into one codegen'd
    * expression — no UDF. Requires `n*bits ≤ 62` (the code must fit a
    * non-negative long).
    */
  def zValueN(cols: Seq[Column], los: Seq[Column], his: Seq[Column],
      bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 1 && los.size == n && his.size == n,
      s"zValueN needs aligned cols/los/his, got $n/${los.size}/${his.size}")
    require(n * bits <= 62,
      s"z-code of $n columns at $bits bits each overflows a long — " +
        "lower bits (n*bits must be <= 62)")
    // scale v into [0, 2^bits) against its domain, integer arithmetic only
    // after one double division (rank-preserving; exactness not required —
    // z-order is a LAYOUT decision, the data itself is never transformed)
    def quantize(v: Column, lo: Column, hi: Column): Column =
      least(
        floor((v - lo).cast("double") / (hi - lo + 1) * (1L << bits)).cast("long"),
        lit((1L << bits) - 1))
    val qs = cols.indices.map(i => quantize(cols(i), los(i), his(i)))
    (for (b <- 0 until bits; i <- 0 until n) yield
      (shiftright(qs(i), b) % 2) * lit(1L << (b * n + (n - 1 - i)))
    ).reduce(_ + _)
  }

  /** The COMPOSED deployment layout (the Delta `OPTIMIZE ZORDER BY` shape
    * on a date-partitioned table): hive-partition on `partCol` AND
    * z-order-cluster on (c1, c2) WITHIN each partition, by range-
    * partitioning the write on (partCol, z) and sorting within tasks.
    * Each partition directory then holds several files covering disjoint
    * z-ranges, so one scan gets BOTH prunings: runtime partition pruning
    * (dynamic partition pruning against a filtered dimension) picks the
    * directories, and parquet footer min/max on the z-clustered columns
    * skips files inside them. LayoutSpec pins both on a single plan.
    */
  def writePartitionedZOrder(df: DataFrame, path: String, partCol: String,
      c1: String, c2: String, numFiles: Int, bits: Int = 8): Unit = {
    val r = df.agg(min(col(c1)), max(col(c1)), min(col(c2)), max(col(c2))).first()
    val (x0, x1, y0, y1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    df.withColumn("__z", zValue(col(c1), col(c2),
        lit(x0), lit(x1), lit(y0), lit(y1), bits))
      .repartitionByRange(numFiles, col(partCol), col("__z"))
      .sortWithinPartitions(partCol, "__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)
  }

  /** Write `df` z-order-clustered on two numeric columns: rows are
    * range-partitioned and sorted by their interleaved-bit Morton code, so
    * each output file covers a compact REGION of the (c1, c2) plane rather
    * than a stripe of one column. Selective scans on EITHER column (or
    * both) then skip most files on parquet footer min/max stats — the
    * property a single-column range layout only gives its own column.
    * The domains are computed in one tiny min/max aggregate and folded in
    * as literals (two scans total: one metadata-sized agg, one write).
    */
  def writeZOrderLayout(df: DataFrame, path: String, c1: String, c2: String,
      numFiles: Int, bits: Int = 16): Unit = {
    val r = df.agg(min(col(c1)), max(col(c1)), min(col(c2)), max(col(c2))).first()
    val (x0, x1, y0, y1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    df.withColumn("__z", zValue(col(c1), col(c2),
        lit(x0), lit(x1), lit(y0), lit(y1), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}

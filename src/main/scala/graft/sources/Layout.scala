package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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
}

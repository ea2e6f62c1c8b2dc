package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs: streaming sinks, dynamic-partition overwrites and
  * retried tasks accumulate files far below the ideal scan granularity,
  * and both the NameNode (one object per file) and the scan planner (one
  * split per tiny file) degrade with file count.
  *
  * In the merge-DOWN direction (many small files → fewer big ones, the
  * normal case) the rewrite is SHUFFLE-FREE: `coalesce(n)` is a narrow
  * dependency — each output task concatenates a set of input splits and
  * writes one file; no exchange, no sort, no data movement between
  * executors beyond reading the inputs, and row order inside a partition
  * is preserved per input file, so previously range- or z-clustered data
  * keeps its file-internal clustering (the spec pins the no-exchange
  * property for this path). In the split-UP direction — the plan asks for
  * MORE files than the scan has splits — coalesce cannot help (it only
  * merges), so [[compact]] falls back to `repartition(n)`: a full
  * round-robin shuffle, the honest price of splitting files, which also
  * does not preserve clustering.
  */
object Compaction {

  /** Compaction plan from the file listing alone (driver-side metadata
    * RPC, no data read): (current file count, total bytes, target output
    * file count = ceil(total / targetBytes), min 1).
    *
    * Operates on ONE LEAF directory — a hive-partitioned root (dt=…/
    * subdirectories) must be compacted per partition, or the rewrite
    * would collapse the partition columns into a single unpartitioned
    * file set; a nested layout fails loudly here instead.
    */
  def plan(spark: SparkSession, path: String, targetBytes: Long): (Int, Long, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p)
    val subdirs = entries.filter(_.isDirectory).map(_.getPath.getName)
    require(subdirs.isEmpty,
      s"$path is a partitioned/nested layout (${subdirs.take(3).mkString(", ")}…) — " +
        "compact each leaf partition directory separately")
    val files = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val total = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    (files.length, total, nOut)
  }

  /** Rewrite `inPath` into ~targetBytes parquet files at `outPath`.
    * Returns (input file count, output file count).
    *
    * `coalesce(n)` can only MERGE partitions — when the plan asks for more
    * output files than the scan produces splits (few huge files, small
    * targetBytes: the split-UP direction), it would silently write fewer,
    * larger files than planned. That case falls back to round-robin
    * `repartition(n)` — a full shuffle, the honest price of splitting
    * files — so the written count matches the plan in both directions. The
    * written count is re-listed and surfaced to the caller; a caller that
    * requires the shuffle-free guarantee should check written == planned
    * from [[plan]].
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): (Int, Int) = {
    val (nIn, _, nOut) = plan(spark, inPath, targetBytes)
    val df = spark.read.parquet(inPath)
    val inSplits = df.rdd.getNumPartitions
    val sized = if (nOut > inSplits) df.repartition(nOut) else df.coalesce(nOut)
    sized.write.mode(SaveMode.Overwrite).parquet(outPath)
    val out = new Path(outPath)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val written = fs.listStatus(out)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (nIn, written)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join building block for repeated
  * large-×-large joins at 100 TB: writing both sides bucketed (and
  * sort-ordered) by the join key lets Spark plan a SortMergeJoin with NO
  * shuffle exchange and NO sort on either side; the one-time bucketing
  * write amortizes over every subsequent join/aggregation on that key.
  *
  * (The reference job never joins, so this is extension surface for the
  * analytics side; BucketingSpec proves the exchange-free plan.)
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table on `key` —
    * warehouse-managed by default, external at `path` when given (the
    * oracle surface's build-inline entries keep their data in
    * JVM-reclaimed temp dirs).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w.saveAsTable(table))(p => w.option("path", p).saveAsTable(table))
  }

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * exchanges when both sides were written by [[writeBucketed]] with the
    * same bucket count.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}

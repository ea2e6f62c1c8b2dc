package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` seam a V1 streaming `Source` cannot avoid:
  * `getBatch` must hand the engine a DataFrame whose logical plan is
  * flagged `isStreaming` (MicroBatchExecution asserts it), and the only
  * constructor for that is `SparkSession.internalCreateDataFrame` — so
  * this object lives under `org.apache.spark.sql` purely for access,
  * the same bridge pattern Delta's `DeltaSource` package uses. Nothing
  * else of Spark's internals is touched here.
  */
object GraftStreamingBridge {
  def streamingFrame(sqlContext: SQLContext, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    // SQLContext surfaces the abstract session type; only the classic
    // implementation (the one a V1 source ever runs under) has the
    // streaming-flagged constructor
    sqlContext.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)

  /** The inverse hand-off for a V1 `Sink`: `addBatch`'s incoming frame
    * is an incremental-execution plan a batch writer must not re-plan
    * (the documented Sink caveat — a fresh action could recompute the
    * epoch from scratch). This anchors it as a plain BATCH frame: the
    * engine's own planned RDD (`queryExecution.toRdd`, rows copied out
    * of the reused unsafe buffers) under a non-streaming logical plan.
    */
  def batchFrame(data: DataFrame): DataFrame = {
    val classic =
      data.asInstanceOf[org.apache.spark.sql.classic.Dataset[
        org.apache.spark.sql.Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd.map(_.copy()), data.schema,
      isStreaming = false)
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** End-to-end corpus curation — the composition the individual pipeline
  * operators exist for: keep documents that pass quality scoring, drop
  * near-dup cluster members that are not their cluster's canonical keeper,
  * and report what survives per language.
  *
  * Two stages by construction: [[Dedup.clusters]] executes eagerly (the
  * label-propagation loop is driver-paced, rounds checkpointed), producing
  * the small drop list; then ONE declarative plan does everything else —
  * the quality predicate is filtered INLINE on the single documents scan
  * (map-only; never a corpus-sized join against the quality report), the
  * drop list anti-joins as a broadcast, and the only corpus-sized shuffle
  * is the final per-language aggregate, partial-aggregated to a handful of
  * rows. A plan spec pins that shape: one file scan, no sort-merge join.
  */
object Curation {

  /** Broadcast the drop list only below this row count (~64 MB of longs
    * with join-hash overhead). The list is every non-canonical near-dup —
    * proportional to corpus size × dup rate, so at 100 TB it exceeds any
    * broadcast budget and must anti-join as a shuffle; an unconditional
    * `broadcast()` hint would OOM the driver there. The count is cheap:
    * the label-propagation loop has already materialized the labels via
    * checkpoint, so this re-reads checkpointed blocks, not the pipeline.
    */
  val BroadcastDropListMaxRows: Long = 4L << 20

  /** Per-language survivors after quality filtering + near-dup dropping. */
  def curate(spark: SparkSession, sfDir: String,
      broadcastMaxRows: Long = BroadcastDropListMaxRows): DataFrame = {
    // labels only — the size join and presentation sort in Dedup.clusters
    // are report surface a drop list does not need
    val dropIds = Dedup.clusterLabels(spark, sfDir)
      .where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val dropSide = if (dropIds.count() <= broadcastMaxRows) broadcast(dropIds)
                   else dropIds // planner/AQE picks shuffled left_anti at scale
    Tables.documents(spark, sfDir)
      .where(TextAnalysis.isQualityCol)
      .join(dropSide, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")
  }

  /** DuckDB oracle: the quality and cluster queries as derived tables,
    * composed exactly like the Spark plan.
    */
  def curateSql: String =
    s"""SELECT d.lang, count(*) AS n_kept,
       |  round(avg(d.n_chars), 2) AS avg_chars,
       |  CAST(sum(d.n_chars) AS BIGINT) AS total_chars
       |FROM documents d
       |JOIN (SELECT doc_id FROM (${TextAnalysis.qualitySql}) WHERE is_quality) q
       |  USING (doc_id)
       |WHERE d.doc_id NOT IN (
       |  SELECT doc_id FROM (${Dedup.clustersSql()}) WHERE doc_id <> cluster_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
}

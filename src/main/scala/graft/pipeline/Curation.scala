package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** End-to-end corpus curation — the composition the individual pipeline
  * operators exist for: keep documents that pass quality scoring, drop
  * near-dup cluster members that are not their cluster's canonical keeper,
  * and report what survives per language. One declarative plan: Catalyst
  * sees the quality filter, the anti-join against the (tiny) drop list,
  * and the final aggregate together, so the documents scan happens inside
  * the same job and the drop list arrives broadcast.
  *
  * At 100 TB: quality is a map-only filter on the scan; the drop list is
  * |near-dup docs| (orders of magnitude smaller than the corpus) and
  * broadcasts; the only corpus-sized shuffle is the final per-language
  * aggregate, which partial-aggregates to |languages| rows.
  */
object Curation {

  /** Per-language survivors after quality filtering + near-dup dropping. */
  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val qualityIds = TextAnalysis.quality(spark, sfDir)
      .where(col("is_quality")).select("doc_id")
    val dropIds = Dedup.clusters(spark, sfDir)
      .where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    docs.join(qualityIds, "doc_id")
      .join(broadcast(dropIds), Seq("doc_id"), "left_anti")
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

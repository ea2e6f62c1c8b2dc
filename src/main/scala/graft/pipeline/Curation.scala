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

  /** Full-pipeline curation — every pre-training filter family composed
    * the way a production corpus release runs them: quality predicate and
    * Gopher repetition flag drop documents, near-dup cluster members drop
    * via the label anti-join, PII is redacted on what survives, and the
    * report counts survivors / PII-bearing docs / redacted volume per
    * language.
    *
    * Scale shape: ONE scan of documents. The quality predicate filters
    * inline on the scan (Columns), the repetition flag rides the same pass
    * as a typed map (its per-doc numerators are a pure function of the
    * text — [[Repetition.isRepetitiveJvm]], same arithmetic as the profile
    * query), PII detection/redaction are codegen'd Columns on the rows
    * that remain, and the only corpus-sized shuffle is the final
    * per-language aggregate. The drop list broadcasts only under the
    * [[BroadcastDropListMaxRows]] gate, exactly like [[curate]].
    */
  def curateFull(spark: SparkSession, sfDir: String,
      broadcastMaxRows: Long = BroadcastDropListMaxRows): DataFrame = {
    import spark.implicits._
    val dropIds = Dedup.clusterLabels(spark, sfDir)
      .where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val dropSide = if (dropIds.count() <= broadcastMaxRows) broadcast(dropIds)
                   else dropIds
    Tables.documents(spark, sfDir)
      .where(TextAnalysis.isQualityCol)
      .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"),
        col("text"))
      .as[(Long, String, Long, String)]
      .map { case (id, lang, nChars, text) =>
        (id, lang, nChars, text, Repetition.isRepetitiveJvm(text))
      }
      .toDF("doc_id", "lang", "n_chars", "text", "is_rep")
      .where(!col("is_rep"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        Pii.hasPiiCol.as("has_pii"), length(Pii.redactedCol).as("red_chars"))
      .join(dropSide, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
        sum(when(col("has_pii"), 1L).otherwise(0L)).as("n_pii_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        sum(col("red_chars").cast("long")).as("total_redacted_chars"))
      .orderBy("lang")
  }

  /** DuckDB oracle for [[curateFull]]: each filter family's own oracle
    * query as a derived table, joined on doc_id.
    */
  def curateFullSql: String =
    s"""SELECT d.lang, count(*) AS n_kept,
       |  CAST(sum(CASE WHEN p.has_pii THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
       |  round(avg(d.n_chars), 2) AS avg_chars,
       |  CAST(sum(length(p.redacted)) AS BIGINT) AS total_redacted_chars
       |FROM documents d
       |JOIN (SELECT doc_id FROM (${TextAnalysis.qualitySql}) WHERE is_quality) q
       |  USING (doc_id)
       |JOIN (SELECT doc_id FROM (${Repetition.repetitionSql}) WHERE NOT is_repetitive) r
       |  USING (doc_id)
       |JOIN (SELECT doc_id, has_pii, redacted FROM (${Pii.scrubSql}) ) p
       |  USING (doc_id)
       |WHERE d.doc_id NOT IN (
       |  SELECT doc_id FROM (${Dedup.clustersSql()}) WHERE doc_id <> cluster_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin

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

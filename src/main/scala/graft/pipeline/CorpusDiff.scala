package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus snapshot diff — the primitive behind incremental pipelines and
  * release audits: given yesterday's and today's corpus, classify every
  * document as added / removed / changed / unchanged by comparing a
  * content fingerprint, never the full text (the join carries (doc_id,
  * 32-byte hash), not documents).
  *
  * Snapshots here are derived deterministically from the one `documents`
  * table so the oracle sees the same pair: the "old" snapshot drops every
  * `doc_id % 10 == 0` (→ ADDED in the new) and truncates the text of
  * every `doc_id % 7 == 0` (→ CHANGED); the "new" snapshot drops every
  * `doc_id % 13 == 0` (→ REMOVED where the old still had it) — all four
  * statuses occur. A real pipeline passes two real snapshot frames to
  * [[diffOf]]; the fixture derivation is just what makes the operator
  * oracle-checkable.
  *
  * Scale shape: one scan per snapshot computing (doc_id, md5(text)) — a
  * map-only projection — then a full-outer equi-join on doc_id (one
  * shuffle each side, hash payloads only) and a metadata-sized status
  * aggregate.
  */
object CorpusDiff {

  /** Classify (doc_id, fp) frames; returns per-status counts + id bounds
    * (bounds make the report row self-describing without dumping ids).
    */
  def diffOf(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id"), col("fp").as("fp_old"))
    val n = newSnap.select(col("doc_id"), col("fp").as("fp_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .otherwise("changed"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy("status")
  }

  def diff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    def fp(text: org.apache.spark.sql.Column) = md5(text.cast("binary"))
    val newSnap = docs
      .where(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), fp(col("text")).as("fp"))
    val oldSnap = docs
      .where(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        fp(when(col("doc_id") % 7 === 0, substring(col("text"), 1, 50))
          .otherwise(col("text"))).as("fp"))
    diffOf(oldSnap, newSnap)
  }

  def diffSql: String =
    """WITH new_snap AS (
      |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 13 <> 0),
      |old_snap AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN substr(text, 1, 50) ELSE text END) AS fp
      |  FROM documents WHERE doc_id % 10 <> 0),
      |joined AS (
      |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |    CASE WHEN o.fp IS NULL THEN 'added'
      |         WHEN n.fp IS NULL THEN 'removed'
      |         WHEN o.fp = n.fp THEN 'unchanged'
      |         ELSE 'changed' END AS status
      |  FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id)
      |SELECT status, count(*) AS n_docs,
      |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      |FROM joined GROUP BY 1 ORDER BY status""".stripMargin
}

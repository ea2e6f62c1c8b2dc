package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashes
import graft.sources.Tables

/** DSIR-shaped data selection: importance resampling of a raw corpus
  * toward a target (curated) text distribution via hashed n-gram features
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023 — public method). Each document is scored by
  * how much more likely its hashed-bigram stream is under the target
  * distribution than under the raw one; the top-scoring documents are the
  * selected training slice.
  *
  * Determinism contract: the published method uses floating log-ratios;
  * floats drift across engines, so the weights here are INTEGER log2
  * magnitudes — `ilog2(n) = length(bin(n)) - 1` (the bit length of n,
  * exact integer arithmetic in Spark and DuckDB alike). Per-bucket weight
  *   w[b] = ilog2(target_n[b]+1) − ilog2(raw_n[b]+1)
  * and the per-occurrence normalizer K = ilog2(T_target+1) −
  * ilog2(T_raw+1) is subtracted once per bigram occurrence, mirroring the
  * log(p̂_t/p̂_r) = (log c_t − log T_t) − (log c_r − log T_r)
  * decomposition at integer-log2 resolution. Add-one smoothing keeps
  * empty buckets finite, as in the paper's smoothed estimator.
  *
  * Scale shape (the reason hashed features exist at all): the feature
  * space is a FIXED fan-out of [[Buckets]] buckets, so the estimated
  * "distributions" are two bucket-count columns over ≤ Buckets rows —
  * parameter-sized, broadcast to the scoring join, never a vocabulary
  * blowup. Two corpus passes total (estimate, then score — the method's
  * own two phases); the scoring shuffle is (doc, bucket)-grain with
  * map-side combine, and selection is a TakeOrderedAndProject top-k
  * (per-partition heads merged on the driver), never a global sort.
  */
object ImportanceSampling {

  /** Fixed hashed-feature fan-out (constant, not data-derived). */
  val Buckets = 2048L

  /** Selected-slice size. */
  val TopK = 50

  /** The curated target slice: a deterministic stand-in for "a small
    * high-quality corpus" (DSIR's target side).
    */
  private def isTarget(lang: Column, docId: Column): Column =
    lang === "en" && docId % 5 === 0

  /** integer log2: bit length − 1, for n ≥ 1 (exact in both engines). */
  private def ilog2(n: Column): Column = length(bin(n)) - 1

  /** One row per bigram OCCURRENCE (counts, not distinct — the estimator
    * is over token frequencies): (doc_id, bucket, is_target). Typed
    * flatMap with the JVM polyHash mirror — one pass, no shuffle.
    */
  private def bigramRows(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"),
        isTarget(col("lang"), col("doc_id")).as("is_target"))
      .as[(Long, String, Boolean)]
      .flatMap { case (id, text, tgt) =>
        val t = text.split(" ", -1)
        (1 until t.length).iterator.map { i =>
          val h = Hashes.polyHashJvm(t(i - 1) + " " + t(i))
          (id, h % Buckets, tgt)
        }
      }
      .toDF("doc_id", "bucket", "is_target")
  }

  /** Score every document and select the TopK by (score desc, doc_id) —
    * ties broken by id so the selected SET is deterministic.
    */
  def importanceTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val rows = bigramRows(docs)

    // estimate pass: ≤ Buckets rows — the whole "model"
    val bucketCounts = rows.groupBy("bucket")
      .agg(count(lit(1)).as("raw_n"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tgt_n"))
    val weights = bucketCounts.select(col("bucket"),
      (ilog2(col("tgt_n") + 1) - ilog2(col("raw_n") + 1)).cast("long").as("w"))
    val totals = bucketCounts.agg(
      (ilog2(sum(col("tgt_n")) + 1) - ilog2(sum(col("raw_n")) + 1))
        .cast("long").as("k_norm"))

    // scoring pass: (doc, bucket) partial counts → broadcast weight join
    val docBucket = rows.groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
    val docScores = docBucket.join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("cnt") * col("w")).cast("long").as("raw_score"),
        sum(col("cnt")).cast("long").as("n_bigrams"))

    docs.select("doc_id")
      .join(docScores, Seq("doc_id"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (coalesce(col("raw_score"), lit(0L)) -
          coalesce(col("n_bigrams"), lit(0L)) * col("k_norm"))
          .cast("long").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(TopK)
  }

  def importanceTopKSql(): String = {
    val h = Hashes.polyHashSql("bigram")
    s"""WITH toks AS (
       |  SELECT doc_id, (lang = 'en' AND doc_id % 5 = 0) AS is_target,
       |         string_split(text, ' ') AS t
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, is_target,
       |         unnest(list_transform(generate_series(1, len(t) - 1),
       |                i -> t[i] || ' ' || t[i+1])) AS bigram
       |  FROM toks WHERE len(t) >= 2),
       |bk AS (SELECT doc_id, is_target, ($h) % ${Buckets} AS bucket FROM bg),
       |bc AS (
       |  SELECT bucket, count(*) AS raw_n,
       |         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tgt_n
       |  FROM bk GROUP BY 1),
       |w AS (
       |  SELECT bucket,
       |         (length(bin(tgt_n + 1)) - 1) - (length(bin(raw_n + 1)) - 1) AS w
       |  FROM bc),
       |tot AS (
       |  SELECT (length(bin(CAST(sum(tgt_n) AS BIGINT) + 1)) - 1)
       |       - (length(bin(CAST(sum(raw_n) AS BIGINT) + 1)) - 1) AS k_norm
       |  FROM bc),
       |dc AS (SELECT doc_id, bucket, count(*) AS cnt FROM bk GROUP BY 1, 2),
       |ds AS (
       |  SELECT doc_id, CAST(sum(cnt * w) AS BIGINT) AS raw_score,
       |         CAST(sum(cnt) AS BIGINT) AS n_bigrams
       |  FROM dc JOIN w USING (bucket) GROUP BY 1)
       |SELECT d.doc_id, coalesce(ds.n_bigrams, 0) AS n_bigrams,
       |       coalesce(ds.raw_score, 0) - coalesce(ds.n_bigrams, 0) * tot.k_norm AS score
       |FROM documents d LEFT JOIN ds USING (doc_id) CROSS JOIN tot
       |ORDER BY score DESC, d.doc_id
       |LIMIT ${TopK}""".stripMargin
  }
}

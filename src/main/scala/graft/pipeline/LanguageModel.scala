package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** N-gram language-model quality scoring — the CCNet-shaped filter
  * (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  * from Web Crawl Data": rank crawl documents by the perplexity of a
  * KenLM n-gram model trained on a clean reference corpus; public
  * method). The deterministic re-expression: a bigram count model trained
  * IN the engine on a reference slice, and a per-document surprisal in
  * integer BITS so the DuckDB oracle reproduces every value exactly —
  * floating log-probabilities would drift across engines, bit lengths
  * cannot (`ilog2(n) = length(bin(n)) − 1`, the [[ImportanceSampling]]
  * estimator discipline).
  *
  * Per transition (u → v), with add-one-style smoothing over a vocabulary
  * of V = |distinct reference tokens| + 1:
  *   surprisal(u,v) = ilog2(c1(u) + V) − ilog2(c2(u,v) + 1)   [≥ 0 bits]
  * c1(u) = reference occurrences of u as a bigram prefix, c2(u,v) =
  * reference bigram count. An unseen prefix costs ilog2(V) bits — the
  * model's maximum — so gibberish scores high (bad) and fluent reference-
  * like text scores low, exactly the CCNet ranking direction.
  *
  * Scale shape: this is the KenLM storage model distributed — the count
  * tables ARE the artifact. c2/c1 are corpus-vocabulary-bounded tables
  * built by map-side-combined aggregates over the reference slice (one
  * scan + one derived aggregate; V is a 1-row aggregate cross-joined in).
  * Scoring is equi-joins of the (doc,u,v)-grain counts against c2/c1 —
  * shuffles keyed on the bigram/prefix, never any pairwise blowup; a hot
  * bigram has ONE row on the model side, so join fan-out is the doc
  * side's own row count. The per-doc fold is one aggregate.
  */
object LanguageModel {

  /** Deterministic clean-reference slice (the "Wikipedia side" of CCNet). */
  private def isReference(docId: Column): Column = docId % 3 === 0

  private def ilog2(n: Column): Column = length(bin(n)) - 1

  /** One row per bigram occurrence: (doc_id, u, v). */
  private def bigramRows(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        (1 until t.length).iterator.map(i => (id, t(i - 1), t(i)))
      }
      .toDF("doc_id", "u", "v")
  }

  /** Score every document's mean surprisal under the reference bigram
    * model. Lower = more reference-like (the CCNet keep signal).
    */
  def perplexityProxy(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val refDocs = docs.filter(isReference(col("doc_id")))

    // the model: bigram counts, prefix counts derived from them, vocab+1
    val c2 = bigramRows(refDocs).groupBy("u", "v").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("u").agg(sum(col("c2")).cast("long").as("c1"))
    val vocab = refDocs
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg((countDistinct(col("tok")) + 1).cast("long").as("vsize"))

    val scored = bigramRows(docs)
      .groupBy("doc_id", "u", "v").agg(count(lit(1)).as("cnt"))
      .join(c2, Seq("u", "v"), "left")
      .join(c1, Seq("u"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("cnt"),
        (ilog2(coalesce(col("c1"), lit(0L)) + col("vsize")) -
          ilog2(coalesce(col("c2"), lit(0L)) + 1)).cast("long").as("bits"),
        col("c2").isNull.as("unseen"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).cast("long").as("n_trans"),
        sum(col("cnt") * col("bits")).cast("long").as("total_bits"),
        sum(when(col("unseen"), col("cnt")).otherwise(0L))
          .cast("long").as("n_unseen"))

    scored.select(col("doc_id"), col("n_trans"), col("total_bits"),
        col("n_unseen"),
        round(col("total_bits") / col("n_trans"), 3).as("bits_per_trans"))
      .orderBy("doc_id")
  }

  def perplexityProxySql(): String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |         unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS u,
      |         unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i+1])) AS v
      |  FROM toks WHERE len(t) >= 2),
      |c2 AS (SELECT u, v, count(*) AS c2 FROM bg WHERE doc_id % 3 = 0 GROUP BY 1, 2),
      |c1 AS (SELECT u, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      |vocab AS (
      |  SELECT CAST(count(DISTINCT tok) + 1 AS BIGINT) AS vsize
      |  FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id % 3 = 0)),
      |dc AS (SELECT doc_id, u, v, count(*) AS cnt FROM bg GROUP BY 1, 2, 3),
      |tr AS (
      |  SELECT dc.doc_id, dc.cnt,
      |         (length(bin(coalesce(c1.c1, 0) + vocab.vsize)) - 1)
      |       - (length(bin(coalesce(c2.c2, 0) + 1)) - 1) AS bits,
      |         c2.c2 IS NULL AS unseen
      |  FROM dc
      |  LEFT JOIN c2 ON dc.u = c2.u AND dc.v = c2.v
      |  LEFT JOIN c1 ON dc.u = c1.u
      |  CROSS JOIN vocab)
      |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_trans,
      |       CAST(sum(cnt * bits) AS BIGINT) AS total_bits,
      |       CAST(sum(CASE WHEN unseen THEN cnt ELSE 0 END) AS BIGINT) AS n_unseen,
      |       round(CAST(sum(cnt * bits) AS BIGINT) * 1.0
      |             / CAST(sum(cnt) AS BIGINT), 3) AS bits_per_trans
      |FROM tr GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
}

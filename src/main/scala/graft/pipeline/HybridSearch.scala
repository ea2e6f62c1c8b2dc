package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Hybrid retrieval with reciprocal-rank fusion (RRF) — the modern search
  * stack's default: a LEXICAL channel (token-overlap ranking against the
  * query document) and a VECTOR channel (exact cosine over the embedding
  * column) each produce a per-query top-N, and the fused score is
  * Σ_channels 1/(rrfK + rank) (Cormack et al.'s RRF — rank-based, so the
  * two channels need no score calibration against each other).
  *
  * Scale shape: the query side (a handful of documents) is bounded and
  * broadcast in BOTH channels; the corpus is scanned once per channel
  * (token stream / vector scan), candidates carry ids + ranks only, and
  * the fusion is a tiny join over 2·N rows per query. Documents without
  * an embedding simply never enter the vector channel — RRF's absent-term
  * handling, not a special case.
  *
  * Determinism: 1/(rrfK + rank) is one double division; each channel term
  * is quantized to integer micro-units and the fused score is the INTEGER
  * sum (the [[Search]] trick), so the oracle reproduces it bit-for-bit.
  * Absent channel ranks surface as 0 (coalesced in both engines — a NULL
  * int column round-trips differently through the two parquet→pandas
  * paths, 0 is unambiguous).
  */
object HybridSearch {

  def rrf(spark: SparkSession, sfDir: String, nQueries: Int = 3,
      perChannel: Int = 20, k: Int = 10, rrfK: Int = 60): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("term"))

    // lexical channel: distinct-token overlap with the query doc
    val qtoks = toks.where(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    val lexW = Window.partitionBy(col("query_id"))
      .orderBy(col("overlap").desc, col("doc_id"))
    val lex = toks.join(broadcast(qtoks), "term")
      .where(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("overlap"))
      .withColumn("lex_rank", row_number().over(lexW))
      .where(col("lex_rank") <= perChannel)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))

    // vector channel: exact cosine, query embeddings broadcast
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val qv = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val vecW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val vec = e.join(broadcast(qv), col("vec_id") =!= col("query_id"))
      .withColumn("cos", Similarity.cosine(col("qv"), col("v")))
      .withColumn("vec_rank", row_number().over(vecW))
      .where(col("vec_rank") <= perChannel)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("vec_rank"))

    // fusion: integer micro-unit RRF sum over whichever channels rank the doc
    def term(rank: org.apache.spark.sql.Column) =
      when(rank.isNotNull, round(lit(1e6) / (lit(rrfK) + rank)).cast("long"))
        .otherwise(lit(0L))
    val fusedW = Window.partitionBy(col("query_id"))
      .orderBy(col("score_u").desc, col("doc_id"))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("score_u", term(col("lex_rank")) + term(col("vec_rank")))
      .withColumn("rank", row_number().over(fusedW))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score_u") / lit(1e6), 6).as("rrf_score"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"))
      .orderBy("query_id", "rank")
  }

  def rrfSql(nQueries: Int = 3, perChannel: Int = 20, k: Int = 10,
      rrfK: Int = 60): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
       |  FROM documents),
       |qtoks AS (SELECT doc_id AS query_id, term FROM toks WHERE doc_id < $nQueries),
       |lex_scored AS (
       |  SELECT q.query_id, t.doc_id, count(*) AS overlap
       |  FROM toks t JOIN qtoks q USING (term)
       |  WHERE t.doc_id <> q.query_id
       |  GROUP BY 1, 2),
       |lex AS (
       |  SELECT query_id, doc_id, lex_rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY overlap DESC, doc_id) AS lex_rank
       |    FROM lex_scored) WHERE lex_rank <= $perChannel),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |vec_scored AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
       |    list_cosine_similarity(q.v, e.v) AS cos
       |  FROM e JOIN e q ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries),
       |vec AS (
       |  SELECT query_id, doc_id, vec_rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, doc_id) AS vec_rank
       |    FROM vec_scored) WHERE vec_rank <= $perChannel),
       |fused AS (
       |  SELECT coalesce(lex.query_id, vec.query_id) AS query_id,
       |    coalesce(lex.doc_id, vec.doc_id) AS doc_id,
       |    lex.lex_rank, vec.vec_rank,
       |    (CASE WHEN lex.lex_rank IS NOT NULL
       |          THEN CAST(round(1000000.0 / ($rrfK + lex.lex_rank)) AS BIGINT)
       |          ELSE 0 END) +
       |    (CASE WHEN vec.vec_rank IS NOT NULL
       |          THEN CAST(round(1000000.0 / ($rrfK + vec.vec_rank)) AS BIGINT)
       |          ELSE 0 END) AS score_u
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_u DESC, doc_id) AS rank
       |  FROM fused)
       |SELECT query_id, rank, doc_id,
       |  round(score_u / 1000000.0, 6) AS rrf_score,
       |  coalesce(lex_rank, 0) AS lex_rank,
       |  coalesce(vec_rank, 0) AS vec_rank
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Vocabulary profiling for tokenizer budgeting: the top-V corpus terms by
  * occurrence count with each prefix's cumulative share of the total token
  * mass — the curve a BPE/vocab-size decision is read from (how much of
  * the corpus does a V-entry vocabulary cover?).
  *
  * Scale shape: one scan → (term) shuffle with map-side combine → global
  * top-V via TakeOrderedAndProject (per-partition heaps, no full sort).
  * The cumulative sum runs over exactly V rows — the one place a
  * single-partition window is CORRECT, because its input is bounded by the
  * query constant, never by the corpus. Total token mass rides along as a
  * broadcast one-row aggregate. Coverage = integer cumsum / integer total,
  * one double division — oracle-exact.
  */
object Vocab {

  def coverage(spark: SparkSession, sfDir: String, v: Int = 50): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("n_occurrences"))
    // total token mass from the aggregated counts, NOT a second corpus
    // explode: this branch reuses the term-shuffle exchange (metadata-sized
    // input) where toks.agg would re-scan every document
    val total = counts.agg(sum(col("n_occurrences")).as("total_tokens"))
    val topV = counts.orderBy(col("n_occurrences").desc, col("term")).limit(v)
    val w = Window.orderBy(col("n_occurrences").desc, col("term"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    topV.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("term"))))
      .withColumn("cum_occurrences", sum(col("n_occurrences")).over(w))
      .select(col("rank"), col("term"), col("n_occurrences"),
        col("cum_occurrences"),
        round(col("cum_occurrences").cast("double") / col("total_tokens"), 6)
          .as("cum_coverage"))
      .orderBy("rank")
  }

  def coverageSql(v: Int = 50): String =
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
       |counts AS (SELECT term, count(*) AS n_occurrences FROM toks GROUP BY 1),
       |total AS (SELECT CAST(sum(n_occurrences) AS BIGINT) AS total_tokens FROM counts),
       |ranked AS (
       |  SELECT term, n_occurrences,
       |    row_number() OVER (ORDER BY n_occurrences DESC, term) AS rank,
       |    CAST(sum(n_occurrences) OVER (ORDER BY n_occurrences DESC, term
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_occurrences
       |  FROM counts)
       |SELECT rank, term, n_occurrences, cum_occurrences,
       |  round(CAST(cum_occurrences AS DOUBLE) / total_tokens, 6) AS cum_coverage
       |FROM ranked CROSS JOIN total
       |WHERE rank <= $v ORDER BY rank""".stripMargin
}

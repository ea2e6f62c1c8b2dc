package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Model-based quality scoring — the "quality classifier" stage of a
  * pre-training pipeline (the fastText/linear-probe shape used by C4's
  * badwords successor filters, FineWeb-Edu, etc.): a linear model over
  * cheap per-document features produces a scalar score; documents are
  * kept above a margin threshold.
  *
  * The weights here are FIXED STUB COEFFICIENTS (documented as such) — the
  * operator's value is the dataflow contract: feature extraction is a
  * map-only expression on the scan (each feature a pure function of one
  * row), the score is a dot product evaluated inline (no model-server
  * join), and the keep decision composes with every other filter family in
  * [[Curation]]. Swapping trained weights in changes constants, not shape.
  *
  * Determinism: each weighted term is quantized to integer micro-units
  * (`round(w·f · 10⁶)`) and the margin is the INTEGER sum — the same
  * order-free trick as [[Search]], so the oracle reproduces the score
  * bit-for-bit. No sigmoid: the margin is monotone in the probability, so
  * thresholding the margin IS thresholding the probability, without the
  * transcendental.
  */
object QualityModel {

  /** (bias, w_len, w_distinct, w_stopword, w_avglen) — stub coefficients,
    * signs chosen the way a trained quality probe comes out: length and
    * lexical diversity up, stopword density mildly up (fluent text has
    * stopwords), very long average tokens down.
    */
  val Bias = -0.5
  val WLen = 0.8
  val WDistinct = 1.2
  val WStopword = 1.5
  val WAvgLen = -0.6

  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  def score(spark: SparkSession, sfDir: String, threshold: Double = 0.55): DataFrame = {
    val toks = split(col("text"), " ")
    val stopSet = Stopwords.map(w => s"'$w'").mkString(", ")
    val stopCnt = size(expr(s"filter(split(text, ' '), x -> x IN ($stopSet))"))
    // features as single expressions, mirrored token-for-token in the oracle
    val fLen = least(size(toks), lit(1000)).cast("double") / 1000
    val fDistinct = size(array_distinct(toks)).cast("double") / size(toks)
    val fStopword = stopCnt.cast("double") / size(toks)
    val fAvgLen = length(regexp_replace(col("text"), " ", "")).cast("double") /
      size(toks) / 10
    def term(w: Double, f: Column): Column = round(f * lit(w) * lit(1e6)).cast("long")
    val marginU = lit(math.round(Bias * 1e6)) +
      term(WLen, fLen) + term(WDistinct, fDistinct) +
      term(WStopword, fStopword) + term(WAvgLen, fAvgLen)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (marginU / lit(1e6)).as("quality_margin"),
        (marginU >= math.round(threshold * 1e6)).as("keep"))
      .withColumn("quality_margin", round(col("quality_margin"), 6))
      .orderBy("doc_id")
  }

  def scoreSql(threshold: Double = 0.55): String = {
    val stopSet = Stopwords.map(w => s"'$w'").mkString(", ")
    val nToks = "len(string_split(text, ' '))"
    val fLen = s"CAST(least($nToks, 1000) AS DOUBLE) / 1000"
    val fDistinct = s"CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / $nToks"
    val fStopword =
      s"CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stopSet))) AS DOUBLE) / $nToks"
    val fAvgLen = s"CAST(length(replace(text, ' ', '')) AS DOUBLE) / $nToks / 10"
    def term(w: Double, f: String) = s"CAST(round(($f) * $w * 1000000.0) AS BIGINT)"
    val marginU = s"${math.round(Bias * 1e6)} + ${term(WLen, fLen)} + " +
      s"${term(WDistinct, fDistinct)} + ${term(WStopword, fStopword)} + " +
      s"${term(WAvgLen, fAvgLen)}"
    s"""SELECT doc_id,
       |  round(($marginU) / 1000000.0, 6) AS quality_margin,
       |  ($marginU) >= ${math.round(threshold * 1e6)} AS keep
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}

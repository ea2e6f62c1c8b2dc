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

  // --------------------------------------------- trained linear classifier

  /** Centering offsets for the four integer features (token count, distinct
    * per-mille, stopword per-mille, avg-token-length centi-chars) — chosen
    * near the fixture corpus means so the planted decision rule passes
    * through the origin and no large bias term has to be learned.
    */
  val Center = Seq(50L, 500L, 60L, 450L)
  /** Planted-label rule weights over the centered features (z2, z3, z4). */
  val PlantW: Seq[Long] = Seq(0L, 2L, 3L, -4L)
  /** Label-noise affine hash params (a, b) mod [[Hashes.Prime]], folded to
    * a uniform offset in [-200, 200] — boundary docs flip, so the planted
    * rule is learnable but not perfectly separable (accuracy ~0.9, not 1).
    */
  val NoiseA = 1103515245L
  val NoiseB = 12345L
  /** Decaying-step batch-perceptron rounds (fixed — part of the contract). */
  val TrainIters = 6

  /** Train an integer linear quality classifier on a planted labeled split
    * and score every document with the learned weights — the upgrade of
    * [[score]]'s stub coefficients to actually-trained ones, with the
    * training loop itself deterministic enough to reproduce bit-for-bit in
    * the SQL oracle (the [[Similarity.trainedCentroidsOf]] discipline
    * applied to classification).
    *
    * Fixture: labels are a noisy linear rule over the centered features
    * (`2·z2 + 3·z3 − 4·z4 + hashNoise(doc_id) ≥ 0`); docs with
    * `doc_id % 5 ≠ 0` train, the rest are a held-out test split reported
    * in the output.
    *
    * Training: [[TrainIters]] rounds of the normalized batch perceptron
    * with a 1/round decaying step — round n computes the misclassified set
    * under the CURRENT weights and moves each weight by
    * `floor(Σ y·z_j / (|misclassified| · n))`. Every update is an
    * order-free INTEGER sum (same reason as the Lloyd rounds: float
    * summation order differs between Spark partial aggregates and DuckDB,
    * integer sums don't), so the oracle replays training exactly.
    *
    * Scale shape: the weight vector is 4 longs on the driver; each round
    * is ONE distributed job — a filter + 5-value aggregate with map-side
    * partial combine, nothing corpus-sized collected or broadcast. The
    * feature frame is computed once and persisted (at 100 TB this is the
    * standard featurize-once-then-iterate layout; 5 longs per doc, ~1000×
    * smaller than the text it came from).
    */
  def trained(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = featureFrame(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val w = trainWeights(feats)
      val m = margin(w)
      feats.select(
          col("doc_id"),
          when(col("doc_id") % 5 =!= 0, "train").otherwise("test").as("split"),
          col("y").as("label"),
          m.as("margin"),
          (m > 0).as("keep"))
        .orderBy("doc_id")
    } finally feats.unpersist()
  }

  /** doc_id, z1..z4 (centered integer features), y (planted noisy label). */
  private def featureFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Hashes
    val toks = split(col("text"), " ")
    val stopSet = Stopwords.map(w => s"'$w'").mkString(", ")
    val stopCnt = size(expr(s"filter(split(text, ' '), x -> x IN ($stopSet))"))
    val z1 = least(size(toks), lit(1000)).cast("long") - Center(0)
    val z2 = floor(lit(1000.0) * size(array_distinct(toks)) / size(toks))
      .cast("long") - Center(1)
    val z3 = floor(lit(1000.0) * stopCnt / size(toks)).cast("long") - Center(2)
    val z4 = floor(lit(100.0) * length(regexp_replace(col("text"), " ", "")) /
      size(toks)).cast("long") - Center(3)
    val noise = (col("doc_id") * NoiseA + NoiseB) % Hashes.Prime % 401 - 200
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), z1.as("z1"), z2.as("z2"), z3.as("z3"), z4.as("z4"),
        noise.as("noise"))
      .withColumn("y",
        when(PlantW.zipWithIndex.map { case (pw, i) =>
          col(s"z${i + 1}") * pw
        }.reduce(_ + _) + col("noise") >= 0, 1L).otherwise(-1L))
      .drop("noise")
  }

  /** The driver-side training loop: one aggregate job per round. */
  private def trainWeights(feats: DataFrame): Array[Long] = {
    val w = Array.fill(4)(0L)
    var n = 1
    while (n <= TrainIters) {
      val m = margin(w)
      val upd = feats
        .where(col("doc_id") % 5 =!= 0 && col("y") * m <= 0)
        .agg(
          sum(col("y") * col("z1")), sum(col("y") * col("z2")),
          sum(col("y") * col("z3")), sum(col("y") * col("z4")),
          count(lit(1)))
        .collect().head
      val cnt = math.max(upd.getLong(4), 1L)
      var j = 0
      while (j < 4) {
        if (!upd.isNullAt(j))
          w(j) += math.floor(upd.getLong(j).toDouble / (cnt * n)).toLong
        j += 1
      }
      n += 1
    }
    w
  }

  private def margin(w: Array[Long]): Column =
    (0 until 4).map(j => col(s"z${j + 1}") * w(j)).reduce(_ + _)

  /** DuckDB oracle for [[trained]] — the identical feature extraction,
    * label rule, and decaying-step perceptron rounds as a CTE chain (the
    * [[Similarity.knnIvfTrainedSql]] pattern), then the identical scoring.
    */
  def trainedSql(): String = {
    import graft.functions.Hashes
    val stopSet = Stopwords.map(w => s"'$w'").mkString(", ")
    val nToks = "len(string_split(text, ' '))"
    val z1 = s"least($nToks, 1000) - ${Center(0)}"
    val z2 = s"CAST(floor(1000.0 * len(list_distinct(string_split(text, ' '))) / $nToks) AS BIGINT) - ${Center(1)}"
    val z3 = s"CAST(floor(1000.0 * len(list_filter(string_split(text, ' '), x -> x IN ($stopSet))) / $nToks) AS BIGINT) - ${Center(2)}"
    val z4 = s"CAST(floor(100.0 * length(replace(text, ' ', '')) / $nToks) AS BIGINT) - ${Center(3)}"
    val noise = s"(doc_id * $NoiseA + $NoiseB) % ${Hashes.Prime} % 401 - 200"
    val plant = PlantW.zipWithIndex.collect {
      case (pw, i) if pw != 0L => s"$pw*z${i + 1}"
    }.mkString(" + ")
    val rounds = (1 to TrainIters).map { n =>
      val p = s"w${n - 1}"
      s"""m$n AS (
         |  SELECT f.*, w.w1*z1 + w.w2*z2 + w.w3*z3 + w.w4*z4 AS m
         |  FROM feats f CROSS JOIN $p w),
         |u$n AS (
         |  SELECT sum(y*z1) s1, sum(y*z2) s2, sum(y*z3) s3, sum(y*z4) s4,
         |    count(*) c
         |  FROM m$n WHERE doc_id % 5 <> 0 AND y*m <= 0),
         |w$n AS (
         |  SELECT
         |    w.w1 + CAST(floor(coalesce(u.s1, 0)*1.0/(greatest(u.c, 1)*$n)) AS BIGINT) AS w1,
         |    w.w2 + CAST(floor(coalesce(u.s2, 0)*1.0/(greatest(u.c, 1)*$n)) AS BIGINT) AS w2,
         |    w.w3 + CAST(floor(coalesce(u.s3, 0)*1.0/(greatest(u.c, 1)*$n)) AS BIGINT) AS w3,
         |    w.w4 + CAST(floor(coalesce(u.s4, 0)*1.0/(greatest(u.c, 1)*$n)) AS BIGINT) AS w4
         |  FROM w${n - 1} w CROSS JOIN u$n u)""".stripMargin
    }.mkString(",\n")
    s"""WITH feats AS (
       |  SELECT doc_id, $z1 AS z1, $z2 AS z2, $z3 AS z3, $z4 AS z4,
       |    CASE WHEN $plant + ($noise) >= 0 THEN 1 ELSE -1 END AS y
       |  FROM documents),
       |w0 AS (SELECT CAST(0 AS BIGINT) w1, CAST(0 AS BIGINT) w2,
       |              CAST(0 AS BIGINT) w3, CAST(0 AS BIGINT) w4),
       |$rounds
       |SELECT f.doc_id,
       |  CASE WHEN f.doc_id % 5 <> 0 THEN 'train' ELSE 'test' END AS split,
       |  f.y AS label,
       |  w.w1*z1 + w.w2*z2 + w.w3*z3 + w.w4*z4 AS margin,
       |  w.w1*z1 + w.w2*z2 + w.w3*z3 + w.w4*z4 > 0 AS keep
       |FROM feats f CROSS JOIN w$TrainIters w
       |ORDER BY f.doc_id""".stripMargin
  }
}

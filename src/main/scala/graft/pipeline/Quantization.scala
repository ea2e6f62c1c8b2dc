package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Embedding quantization — the storage side of a 100 TB vector corpus:
  * symmetric per-vector int8 (scale = max|x|/127, qᵢ = round(xᵢ/scale))
  * cuts embedding bytes 4× (plus one double per vector), which at scale
  * decides whether an ANN index fits in cluster memory at all. The
  * operator emits the quantization QUALITY report — reconstruction cosine
  * and max absolute error per vector — because the decision a pipeline
  * owner actually makes is "is int8 fidelity acceptable for this corpus",
  * and the error bound (max_abs_err ≤ scale/2) is checkable row by row.
  *
  * All arithmetic is a fixed IEEE-double sequence (max|x|, one divide, one
  * half-away-from-zero round, multiply-back) mirrored exactly by the
  * DuckDB oracle, so the report is hash-gated end to end. A zero vector
  * has scale 0 and an undefined reconstruction cosine — reported as NULL,
  * identically in both engines.
  *
  * Scale shape: pure typed map, one scan, zero shuffle (each vector's
  * quantization is a function of itself); the only exchange is the
  * presentation sort.
  */
object Quantization {

  /** Per-vector int8 quantization report: (vec_id, scale, recon_cosine,
    * max_abs_err).
    */
  def int8Report(spark: SparkSession, sfDir: String): DataFrame =
    int8ReportOf(Tables.embeddings(spark, sfDir))

  /** [[int8Report]] over any (vec_id, embedding) frame. */
  def int8ReportOf(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        var maxAbs = 0.0
        var i = 0
        while (i < v.length) { val a = math.abs(v(i)); if (a > maxAbs) maxAbs = a; i += 1 }
        val scale = maxAbs / 127
        if (scale == 0.0) (id, 0.0, None: Option[Double], 0.0)
        else {
          // q_i = round-half-away(x_i/scale); dequant = q_i * scale.
          // cosine(v, dequant) mirrors graft_cosine's fold order exactly
          var dot = 0.0; var nv = 0.0; var nq = 0.0; var maxErr = 0.0
          i = 0
          while (i < v.length) {
            val y = v(i) / scale
            val q = (if (y >= 0) math.floor(y + 0.5) else -math.floor(-y + 0.5)) * scale
            val e = math.abs(v(i) - q)
            if (e > maxErr) maxErr = e
            dot += v(i) * q; nv += v(i) * v(i); nq += q * q
            i += 1
          }
          (id, scale, Some(dot / (math.sqrt(nv) * math.sqrt(nq))), maxErr)
        }
      }
      .toDF("vec_id", "scale_raw", "cos_raw", "err_raw")
      .select(col("vec_id"), round(col("scale_raw"), 6).as("scale"),
        round(col("cos_raw"), 6).as("recon_cosine"),
        round(col("err_raw"), 6).as("max_abs_err"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle — identical max|x|, scale, per-component round, and
    * fold-order cosine.
    */
  val int8ReportSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) / 127 AS scale
      |  FROM e),
      |q AS (SELECT vec_id, v, scale,
      |    list_transform(v, x -> round(x / scale) * scale) AS d
      |  FROM s WHERE scale <> 0)
      |SELECT vec_id, round(scale, 6) AS scale,
      |  round(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * d[i]))
      |    / (sqrt(list_sum(list_transform(v, x -> x * x)))
      |       * sqrt(list_sum(list_transform(d, x -> x * x)))), 6) AS recon_cosine,
      |  round(list_max(list_transform(generate_series(1, len(v)),
      |    i -> abs(v[i] - d[i]))), 6) AS max_abs_err
      |FROM q
      |UNION ALL
      |SELECT vec_id, 0.0 AS scale, NULL AS recon_cosine, 0.0 AS max_abs_err
      |FROM s WHERE scale = 0
      |ORDER BY vec_id""".stripMargin
}

package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Invariants for int8 quantization: the error bound, reconstruction
  * fidelity on real vectors, and the zero-vector edge.
  */
class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("max absolute error never exceeds scale/2 (+ rounding slack) and cosine stays high") {
    val out = Quantization.int8Report(spark, "/root/testdata/sf0.001").cache()
    // symmetric round-to-nearest: per-component error ≤ scale/2; the
    // reported values are rounded to 6 places, so allow that slack
    assert(out.where(col("max_abs_err") > col("scale") / 2 + 1e-6).count() === 0)
    // int8 over 64-dim unit-ish vectors: reconstruction cosine ≥ 0.999
    assert(out.where(col("recon_cosine") < 0.999).count() === 0)
    assert(out.count() ===
      graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001").count())
  }

  test("a zero vector reports scale 0 and NULL cosine; a known vector round-trips") {
    val df = Seq(
      (1L, Array(0f, 0f, 0f, 0f)),
      // maxAbs = 127 → scale = 1.0 exactly, and every component is an
      // integer, so quantization round-trips bit-for-bit
      (2L, Array(127f, -64f, 32f, 0f))
    ).toDF("vec_id", "embedding")
    val rows = Quantization.int8ReportOf(df).collect()
    val zero = rows.find(_.getLong(0) == 1L).get
    assert(zero.getDouble(1) === 0.0)
    assert(zero.isNullAt(2))
    assert(zero.getDouble(3) === 0.0)
    val known = rows.find(_.getLong(0) == 2L).get
    assert(known.getDouble(2) > 0.999999, "exact-multiple components must round-trip")
  }
}

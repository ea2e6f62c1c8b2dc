package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity
import graft.testkit.SparkTestSession

/** The native graft_cosine expression must be a drop-in for the HOF fold:
  * bit-identical results (the DuckDB oracles depend on it), SQL-callable
  * through the extension registration, null-propagating.
  */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def foldCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    def norm(x: org.apache.spark.sql.Column) =
      sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v * v))
    dot(a, b) / (norm(a) * norm(b))
  }

  test("bit-identical to the interpreted fold on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(_ =>
      (Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
      .withColumn("native", Similarity.cosine(col("a"), col("b")))
      .withColumn("fold", foldCosine(col("a"), col("b")))
    // exact equality, not tolerance — the arithmetic contract is identical
    assert(df.where(col("native") =!= col("fold")).count() === 0)
  }

  test("callable from SQL text via the extension registration") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c, " +
        "graft_cosine(array(2.0d, 0.0d), array(1.0d, 0.0d)) AS c2")
      .collect().head
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 1.0)
  }

  test("null array propagates null") {
    val r = spark.sql(
      "SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))").collect().head
    assert(r.isNullAt(0))
  }

  test("length mismatch and null elements yield null, like the fold form") {
    // a corrupt (short) vector must drop out of threshold filters, not
    // produce a prefix cosine
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d)) AS mism, " +
        "graft_cosine(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS nullel")
      .collect().head
    assert(r.isNullAt(0), "length mismatch must be null")
    assert(r.isNullAt(1), "null element must be null")
  }
}

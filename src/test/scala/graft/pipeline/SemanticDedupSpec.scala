package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** SemDeDup invariants: the intra-cell pair set is exactly the exact
  * pair set restricted to co-clustered ids — no phantom pairs, correct
  * threshold, deterministic cells.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val pairs = SemanticDedup.semanticPairs(spark, sfDir).cache()

  test("pairs are ordered, thresholded, and non-empty on this corpus") {
    val rows = pairs.collect()
    assert(rows.nonEmpty, "expected intra-cell near-dup pairs at sf0.001")
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(2), "id_a < id_b")
      assert(r.getDouble(3) >= 0.4, s"cosine ${r.getDouble(3)} under threshold")
    }
  }

  test("semantic pairs = exact pairs ∩ co-clustered (no phantom, no missed in-cell pair)") {
    // the exact audit tool at the same threshold is the ground truth; a
    // semantic pair must be an exact pair, and an exact pair whose two ids
    // share a cell must be found
    val exact = Dedup.embeddingCosine(spark, sfDir, threshold = 0.4)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = pairs.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(exact), s"phantom pairs: ${sem.diff(exact).take(3)}")

    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val cents = Similarity.trainedCentroidsOf(e, 50, 3)
      .select(col("centroid_id"), transform(col("cq"), _.cast("double")).as("cv"))
    val cellOf = Similarity.cellAssignments(e, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = exact.filter { case (a, b) => cellOf(a) == cellOf(b) }
    assert(sem === expected)
  }

  test("cell assignment is deterministic across runs") {
    val a = pairs.select("cell", "id_a", "id_b").collect().toSeq
    val b = SemanticDedup.semanticPairs(spark, sfDir)
      .select("cell", "id_a", "id_b").collect().toSeq
    assert(a === b)
  }
}

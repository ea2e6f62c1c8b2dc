package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Semantic deduplication (the SemDeDup shape, Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with k-means, then
  * compare pairs ONLY within each cluster — near-duplicates are, by
  * construction of the embedding, near in cosine, so confining the
  * quadratic comparison to cells turns O(n²) into Σ|cell|², bounded by
  * choosing k proportional to n (fixed expected cell size).
  *
  * This composes two machines that already carry oracles:
  * [[Similarity.trainedCentroidsOf]] (deterministic integer-Lloyd k-means;
  * centroids live on the driver, bounded by k) and
  * [[Similarity.cellAssignments]] (shuffle-free typed-map argmax). The only
  * NEW dataflow is the intra-cell pair join — one shuffle of (cell, id,
  * vector) and a per-cell quadratic verify.
  *
  * Scale shape at 100 TB: train k-means on a sample, pick k so cells hold
  * ~10³–10⁴ vectors; the pair join shuffles each vector once (keyed by
  * cell) and each reducer does |cell|² primitive-loop cosines. Nothing is
  * ever broadcast except the k×dim centroid array. Skewed cells are the
  * hazard — a pathological cluster (all-identical embeddings) concentrates
  * work; the mitigation at scale is recursive splitting of oversized cells
  * (re-running Lloyd inside the cell), which preserves the same contract.
  *
  * Dedup semantics: emit every intra-cell pair with cosine ≥ threshold
  * (id_a < id_b); the canonical keep-rule downstream is min-id (identical
  * to the other dedup families — [[Curation]] consumes pairs the same way).
  */
object SemanticDedup {

  /** Intra-cell near-dup pairs at `threshold`, cells trained by `iters`
    * integer-Lloyd rounds from a `vec_id % stride == 0` init.
    */
  def semanticPairs(spark: SparkSession, sfDir: String,
      stride: Int = 50, iters: Int = 3, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val cents = Similarity.trainedCentroidsOf(e, stride, iters)
      .select(col("centroid_id"), transform(col("cq"), _.cast("double")).as("cv"))
    val assigned = Similarity.cellAssignments(e, cents)
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"), col("v").as("va"))
    val b = assigned.select(col("cell").as("cell_b"), col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, col("cell") === col("cell_b") && col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("cell"), col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
      .orderBy("cell", "id_a", "id_b")
  }

  /** DuckDB oracle: the shared trained-cells CTE chain
    * ([[Similarity.trainedCellsSqlWith]]), then the identical intra-cell
    * pair join and exact-cosine verify.
    */
  def semanticPairsSql(stride: Int = 50, iters: Int = 3, threshold: Double = 0.4,
      dim: Int = 64): String =
    s"""${Similarity.trainedCellsSqlWith(stride, iters, dim)}
       |SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(list_cosine_similarity(a.v, b.v), 4) AS cosine
       |FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(a.v, b.v) >= $threshold
       |ORDER BY a.cell, id_a, id_b""".stripMargin
}

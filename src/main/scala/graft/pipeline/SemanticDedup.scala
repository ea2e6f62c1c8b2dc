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
  * ever broadcast except the k×dim centroid array. Skewed cells (a
  * pathological all-near-identical cluster) are handled by BLOCKING
  * inside the cell — the same scheme as the exact audit tool
  * ([[Dedup.embeddingCosineOf]]), keyed by (cell, block): a cell's
  * vectors split into `blocks` id-hash buckets, block PAIRS join, so no
  * single task ever holds more than ~2·|cell|/blocks vectors and the
  * widest cell spreads over blocks·(blocks+1)/2 tasks. The blocking is a
  * PLAN property only — the emitted pair set is identical, so the oracle
  * is unchanged (unlike recursive cell splitting, which changes results).
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
      stride: Int = 50, iters: Int = 3, threshold: Double = 0.4,
      blocks: Int = 8): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val cents = Similarity.trainedCentroidsOf(e, stride, iters)
      .select(col("centroid_id"), transform(col("cq"), _.cast("double")).as("cv"))
    val assigned = Similarity.cellAssignments(e, cents)
    val grouped = assigned.select(col("cell"), col("vec_id"), col("v"))
      .as[(Long, Long, Array[Double])]
      .groupByKey(r => (r._1, (r._2 % blocks).toInt))
      .mapGroups((key, it) => (key._1, key._2, it.map(r => (r._2, r._3)).toArray))
      .toDF("cell", "blk", "vs")
    // the a-side fans out to every partner block ≥ its own, so the join is
    // EQUI-keyed on (cell, partner block) — (cell, blk) actually reaches
    // the shuffle key and a skewed cell's block pairs land on different
    // reducers. (A `a.blk <= b.blk` condition instead would leave `cell`
    // as the only equi-key and re-concentrate the whole cell on one task.)
    val fanned = grouped
      .withColumn("bb", explode(sequence(col("blk"), lit(blocks - 1))))
      .select(col("cell").as("a_cell"), col("blk").as("ba"),
        col("vs").as("va"), col("bb"))
    val pairs = fanned
      .join(grouped,
        col("a_cell") === col("cell") && col("bb") === col("blk"))
      .select(col("cell"), col("ba"), col("va"),
        col("blk").as("bb"), col("vs").as("vb"))
      .as[(Long, Int, Array[(Long, Array[Double])], Int, Array[(Long, Array[Double])])]
      .flatMap { case (cell, ba, va, bb, vb) =>
        // the shared oracle-exact kernel — one definition for every family
        val cos = Similarity.cosJvm _
        if (ba == bb)
          // same block joined with itself: va eq vb, upper triangle only
          for {
            i <- Iterator.range(0, va.length)
            j <- Iterator.range(i + 1, va.length)
            c = cos(va(i)._2, va(j)._2)
            if c >= threshold
          } yield {
            val (lo, hi) = if (va(i)._1 < va(j)._1) (va(i)._1, va(j)._1)
                           else (va(j)._1, va(i)._1)
            (cell, lo, hi, c)
          }
        else
          // distinct blocks: full cross, id order normalized (the smaller
          // id may live in EITHER block)
          for {
            (ia, xa) <- va.iterator
            (ib, xb) <- vb.iterator
            c = cos(xa, xb)
            if c >= threshold
          } yield {
            val (lo, hi) = if (ia < ib) (ia, ib) else (ib, ia)
            (cell, lo, hi, c)
          }
      }
      .toDF("cell", "id_a", "id_b", "cos")
    pairs
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

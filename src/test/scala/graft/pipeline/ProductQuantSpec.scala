package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

/** Invariants for PQ/ADC search: the top-k output contract, recall in both
  * regimes (the honest random-corpus floor and the planted high-cosine
  * regime the operator is actually for), and the unit-norm premise that
  * makes inner-product order comparable to the cosine brute force.
  */
class ProductQuantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("ADC top-k contract: k rows per query, contiguous ranks, scores non-increasing, no self") {
    val knn = ProductQuant.knnPqAdc(spark, sfDir, nQueries = 5, k = 4).cache()
    val perQuery = knn.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("maxr"), min("rank").as("minr"))
    assert(perQuery.where(col("n") =!= 4 || col("maxr") =!= 4 || col("minr") =!= 1).count() === 0)
    assert(knn.where(col("query_id") === col("neighbor_id")).count() === 0)
    val sorted = knn.orderBy("query_id", "rank")
      .select("query_id", "rank", "score").collect()
    sorted.sliding(2).foreach {
      case Array(a, b) if a.getLong(0) == b.getLong(0) =>
        assert(a.getLong(2) >= b.getLong(2),
          s"score increased with rank for query ${a.getLong(0)}")
      case _ => ()
    }
  }

  test("random-corpus recall@5 vs cosine brute force meets the honest floor") {
    // premise check: IP order == cosine order only because the corpus is
    // unit-norm — if the generator ever changes, this fails loudly rather
    // than silently degrading the comparison below
    val norm = Tables.embeddings(spark, sfDir)
      .select(sqrt(aggregate(Similarity.toDoubleVec(col("embedding")),
        lit(0.0), (acc, x) => acc + x * x)).as("n"))
    assert(norm.where(abs(col("n") - 1.0) > 1e-3).count() === 0,
      "corpus must be unit-norm for IP-vs-cosine recall comparison")
    // a random near-orthogonal corpus is PQ's WORST case: true neighbors
    // sit at cosine ~0.3-0.4 separated by margins smaller than the
    // codebook cell radius. Fully deterministic pipeline ⇒ this is a
    // pinned value (0.32 at m=16), not a flake; the floor just leaves
    // headroom for parameter retuning.
    val brute = Similarity.knnBruteForce(spark, sfDir, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id")
    val pq = ProductQuant.knnPqAdc(spark, sfDir, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id")
    val hits = brute.join(pq, Seq("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / brute.count()
    assert(recall >= 0.3, s"random-corpus recall $recall below floor 0.3")
  }

  test("IVF-PQ contract: candidates confined to the query's cell, ranks contiguous, no self") {
    val out = ProductQuant.knnIvfPq(spark, sfDir, nQueries = 5, k = 4).cache()
    assert(out.where(col("query_id") === col("neighbor_id")).count() === 0)
    val perQuery = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("maxr"))
    // a cell can hold < k+1 members, so n <= k with contiguous ranks
    assert(perQuery.where(col("n") > 4 || col("maxr") =!= col("n")).count() === 0)
    // every (query, neighbor) pair must share an IVF cell — IVF-PQ may
    // never reach outside the coarse index's pruning
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val cells = Similarity.cellAssignments(e, Similarity.centroidsOf(e, 50))
      .select(col("vec_id"), col("cell"))
    val crossCell = out
      .join(cells.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("cell", "qc"), "query_id")
      .join(cells.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("cell", "nc"), "neighbor_id")
      .where(col("qc") =!= col("nc")).count()
    assert(crossCell === 0, "IVF-PQ returned a neighbor outside the query's cell")
  }

  test("PQ retrieves every planted high-cosine near-dup as top-1 (the regime it is for)") {
    // 10 query bases with planted near-copies (cosine ≳ 0.97) + 100 noise
    // vectors. Deterministic seed + deterministic training ⇒ pinned result.
    val rnd = new scala.util.Random(97531)
    val dim = 64
    val rows =
      (0 until 10).flatMap { i =>
        val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
        val near = base.map(x => x + (rnd.nextGaussian() * 0.08).toFloat)
        Seq((i.toLong, base), (100L + i, near))
      } ++ (0 until 100).map(i => (200L + i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    // smaller stride: the fixture has ~120 vectors, stride 8 keeps ~15
    // codewords per subspace
    val top1 = ProductQuant.knnPqAdcOf(df, nQueries = 10, k = 1, codeStride = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 10).foreach { i =>
      assert(top1(i.toLong) === 100L + i,
        s"query $i: planted near-dup not retrieved as top-1 (got ${top1(i.toLong)})")
    }
  }

  test("recall audit: one row per query, hits bounded by k, recall = hits/k") {
    val k = 5
    val rows = ProductQuant.annRecall(spark, sfDir, nQueries = 10, k = k)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L until 10L))
    rows.foreach { r =>
      val hits = r.getLong(1)
      assert(hits >= 0L && hits <= k, s"hits $hits outside [0, $k]")
      assert(r.getDouble(2) ===
        BigDecimal(hits.toDouble / k).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the fixture's IVF-PQ configuration finds at least SOME true
    // neighbors — an all-zero recall row would mean the audit is vacuous
    assert(rows.map(_.getLong(1)).sum > 0L, "recall audit is vacuous (0 hits)")
  }
}

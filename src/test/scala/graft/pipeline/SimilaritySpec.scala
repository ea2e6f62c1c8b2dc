package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

/** Invariants for the similarity-search operators: exact top-k correctness
  * of the brute-force baseline (checked against an independent in-driver
  * recomputation), IVF's subset/ranking contract, and LSH verification
  * soundness (no false positives — recall is the tunable, precision is not).
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("brute-force kNN: k rows per query, ranks contiguous, cosine non-increasing") {
    val knn = Similarity.knnBruteForce(spark, sfDir, nQueries = 5, k = 4).cache()
    val perQuery = knn.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("maxr"), min("rank").as("minr"))
    assert(perQuery.where(col("n") =!= 4 || col("maxr") =!= 4 || col("minr") =!= 1).count() === 0)
    assert(knn.where(col("query_id") === col("neighbor_id")).count() === 0)
    // cosine must be non-increasing in rank within each query
    val sorted = knn.orderBy("query_id", "rank")
      .select("query_id", "rank", "cosine").collect()
    sorted.sliding(2).foreach {
      case Array(a, b) if a.getLong(0) == b.getLong(0) =>
        assert(a.getDouble(2) >= b.getDouble(2),
          s"cosine increased with rank for query ${a.getLong(0)}")
      case _ => ()
    }
  }

  test("brute-force kNN rank-1 matches an independent argmax recomputation") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val top1 = Similarity.knnBruteForce(spark, sfDir, nQueries = 5, k = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    top1.foreach { case (q, got) =>
      val expected = e.filterNot(_._1 == q)
        .maxBy { case (id, v) => (cos(e(q), v), -id) }._1
      assert(got === expected, s"query $q: expected neighbor $expected, got $got")
    }
  }

  test("IVF kNN neighbors are a subset of the full corpus with correct cosines") {
    val ivf = Similarity.knnIvf(spark, sfDir, nQueries = 5, k = 4).cache()
    // per-query ranking contract (cells can hold < k+1 vectors, so n <= k)
    val bad = ivf.groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("maxr"))
      .where(col("n") > 4 || col("maxr") =!= col("n")).count()
    assert(bad === 0)
    assert(ivf.where(col("query_id") === col("neighbor_id")).count() === 0)
    // every reported cosine must equal the true cosine of that pair
    // (IVF approximates the candidate SET, never the scores)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val recomputed = ivf
      .join(e.as("q"), col("query_id") === col("q.vec_id"))
      .join(e.as("n"), col("neighbor_id") === col("n.vec_id"))
      .withColumn("true_cos", round(Similarity.cosine(col("q.v"), col("n.v")), 4))
    assert(recomputed.where(abs(col("cosine") - col("true_cos")) > 1e-9).count() === 0)
  }

  test("IVF multi-probe recall dominates single-probe and is exact at nProbe = nCells") {
    def recallVsBrute(ivf: org.apache.spark.sql.DataFrame): Double = {
      val brute = Similarity.knnBruteForce(spark, sfDir, nQueries = 5, k = 4)
        .select("query_id", "neighbor_id")
      val hit = brute.join(ivf.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
      hit.toDouble / brute.count()
    }
    val r1 = recallVsBrute(Similarity.knnIvf(spark, sfDir, nQueries = 5, k = 4))
    val r2 = recallVsBrute(Similarity.knnIvfProbe(spark, sfDir, nQueries = 5, k = 4, nProbe = 2))
    assert(r2 >= r1, s"nProbe=2 recall $r2 must dominate nProbe=1 recall $r1")
    // probing every cell degenerates to exact search: recall 1.0
    val nCells = Tables.embeddings(spark, sfDir).where(col("vec_id") % 50 === 0).count().toInt
    val rAll = recallVsBrute(
      Similarity.knnIvfProbe(spark, sfDir, nQueries = 5, k = 4, nProbe = nCells))
    assert(rAll === 1.0, s"nProbe=$nCells (all cells) must reach full recall, got $rAll")
  }

  test("trained IVF: valid top-k shape and recall not below stride centroids") {
    // sf0.01: at sf0.001 the corpus yields only 2 cells, leaving k-means
    // nothing to improve — recall dominance is measured where cells are
    // plural (40 at sf0.01)
    val dir = "/root/testdata/sf0.01"
    def recallVsBrute(ivf: org.apache.spark.sql.DataFrame): Double = {
      val brute = Similarity.knnBruteForce(spark, dir, nQueries = 10, k = 5)
        .select("query_id", "neighbor_id")
      val hits = ivf.select("query_id", "neighbor_id")
        .join(brute, Seq("query_id", "neighbor_id")).count()
      hits.toDouble / brute.count()
    }
    val trained = Similarity.knnIvfTrained(spark, dir, nQueries = 40, k = 5)
    // shape: ranks contiguous per query
    val byQuery = trained.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(byQuery.where(col("n") =!= col("mx")).count() === 0)
    val rStride = recallVsBrute(Similarity.knnIvf(spark, dir, nQueries = 40, k = 5))
    val rTrained = recallVsBrute(trained)
    // measured: 0.30 stride vs 0.34 trained (3 Lloyd rounds) — strict
    // improvement, deterministic (integer training arithmetic)
    assert(rTrained > rStride,
      s"trained-centroid recall $rTrained must beat stride recall $rStride")
    info(s"recall at sf0.01: stride=$rStride trained=$rTrained")
  }

  test("hyperplane LSH pairs: no false positives, ordered, deduplicated") {
    val pairs = Similarity.cosineLshPairs(spark, sfDir).cache()
    assert(pairs.where(col("id_a") >= col("id_b")).count() === 0)
    assert(pairs.groupBy("id_a", "id_b").count().where(col("count") > 1).count() === 0)
    assert(pairs.where(col("cosine") < 0.4).count() === 0)
    // soundness vs the exhaustive pair scan: LSH output ⊆ brute-force pairs
    val brute = Dedup.embeddingCosine(spark, sfDir)
      .select("id_a", "id_b")
    assert(pairs.join(brute, Seq("id_a", "id_b"), "left_anti").count() === 0)
  }

  test("LSH finds every planted high-cosine near-dup (the regime it is for)") {
    // 40 deterministic base vectors, each with a planted near-copy
    // (small perturbation ⇒ cosine ≳ 0.97). Everything is deterministic
    // (fixed seed + fixed hyperplanes), so this is a pinned result, not a
    // probabilistic flake.
    val rnd = new scala.util.Random(1234)
    val dim = 64
    val rows = (0 until 40).flatMap { i =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val near = base.map(x => x + (rnd.nextGaussian() * 0.08).toFloat)
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, near))
    }
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    val found = Similarity.cosineLshPairsOf(df, threshold = 0.9)
      .where(col("id_b") === col("id_a") + 1 && col("id_a") % 2 === 0)
    // planted pairs that truly clear the 0.9 threshold
    val trueHigh = Dedup.embeddingCosineOf(df, threshold = 0.9)
      .where(col("id_b") === col("id_a") + 1 && col("id_a") % 2 === 0)
    val nTrue = trueHigh.count()
    assert(nTrue >= 35, s"fixture should plant >=35 high-cosine pairs, got $nTrue")
    assert(found.count() === nTrue, "recall must be 1.0 on high-cosine near-dups")
  }

  test("surface entry: plantNearDups makes the ANN oracle row non-vacuous at 0.8") {
    // the natural fixture holds no pairs above cosine ~0.55, so the surface
    // entry augments it with deterministic planted copies — this pins that
    // the augmentation really produces high-cosine rows (a broken candidate
    // join would now FAIL the oracle hash gate instead of matching 0 = 0)
    val aug = Similarity.plantNearDups(Tables.embeddings(spark, sfDir))
    val nPlanted = aug.where(col("vec_id") >= 10000000L).count()
    assert(nPlanted > 0)
    val out = Similarity.cosineLshPairsPlanted(spark, sfDir).cache()
    assert(out.count() > 0, "the planted surface entry must return rows")
    assert(out.where(col("cosine") < 0.8).count() === 0)
    // every reported pair is (original, its planted copy) on this corpus
    assert(out.where(col("id_b") =!= col("id_a") + 10000000L).count() === 0)
    // and recall over the planted pairs is total: each copy differs from
    // its original in ONE coordinate, so bucket signatures rarely diverge —
    // with 8 OR'd tables a miss would indicate a broken bucketing
    assert(out.count() === nPlanted)
  }

  test("dedup_embedding_ann (threshold 0.8): recall bound vs the exact audit tool on planted near-dups") {
    // the natural corpus holds no pairs above cosine ~0.55 (verified —
    // the surface entry plants near-dups for exactly that reason), so
    // the recall bound runs on an in-memory planted fixture: 60
    // bases with near-copies at graded noise (cosine ≈ 0.82–0.99) plus
    // 80 unrelated vectors. Deterministic seed + fixed hyperplanes ⇒
    // pinned result, not a probabilistic flake.
    val rnd = new scala.util.Random(4321)
    val dim = 64
    val planted = (0 until 60).flatMap { i =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val eps = 0.15f + 0.35f * (i % 5) / 4f // cosine ≈ 0.99 down to ≈ 0.82
      val near = base.map(x => x + rnd.nextGaussian().toFloat * eps)
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, near))
    }
    val noise = (0 until 80).map(i => (1000L + i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    import spark.implicits._
    val df = (planted ++ noise).toDF("vec_id", "embedding")
    val ann = Similarity.cosineLshPairsOf(df, threshold = 0.8)
      .select("id_a", "id_b").cache()
    val exact = Dedup.embeddingCosineOf(df, threshold = 0.8)
      .select("id_a", "id_b").cache()
    val nExact = exact.count()
    assert(nExact >= 35, s"fixture should plant >=35 true pairs at 0.8, got $nExact")
    val missed = exact.join(ann, Seq("id_a", "id_b"), "left_anti").count()
    val recall = (nExact - missed).toDouble / nExact
    assert(recall >= 0.9, s"ANN recall $recall below 0.9 ($missed of $nExact missed)")
    // precision is structural: every ANN pair is exact-cosine verified
    assert(ann.join(exact, Seq("id_a", "id_b"), "left_anti").count() === 0)
  }

  test("binary-Hamming rerank: valid shape, Hamming bounded, recall@5 vs exact") {
    val sfDir = "/root/testdata/sf0.001"
    val bin = Similarity.knnBinaryHamming(spark, sfDir).cache()
    val rows = bin.collect()
    // shape: 5 contiguous ranks per query, hamming within [0, 64]
    assert(rows.groupBy(_.getLong(0)).forall { case (_, rs) =>
      rs.map(_.getInt(1)).sorted.toSeq == (1 to 5) })
    assert(rows.forall(r => r.getLong(4) >= 0 && r.getLong(4) <= 64))
    // the 1-bit shortlist + exact rerank recovers most of the exact
    // top-5 (deterministic on this fixture; the bound is the contract —
    // a packing/popcount bug collapses recall toward random, 5/500)
    val exact = Similarity.knnBruteForce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"binary shortlist recall@5 collapsed: $recall")
  }

  test("identical vectors always collide in every LSH table (recall floor)") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val dupPairs = e.as("a").join(e.as("b"),
        col("a.v") === col("b.v") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    val lsh = Similarity.cosineLshPairs(spark, sfDir)
    assert(dupPairs.join(lsh, Seq("id_a", "id_b"), "left_anti").count() === 0)
  }
}

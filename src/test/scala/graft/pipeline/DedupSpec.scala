package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

/** Invariant suite for the dedup operators at sf0.001. The DuckDB oracle
  * (tools/compare_oracle.py, driver CORRECTNESS gate) pins exact outputs;
  * these tests pin the *semantic* invariants that must hold at any scale —
  * partition-of-the-corpus properties, LSH recall against exact Jaccard,
  * and candidate-verification correctness.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val nDocs = Tables.documents(spark, sfDir).count()

  test("clusters under a reliable checkpoint dir: identical result, checkpoints written") {
    // the cluster-mode materialization path: executor-resident
    // localCheckpoint blocks die with an executor; with CheckpointDirConf
    // set the loop must checkpoint into the reliable dir and converge to
    // the same labels
    val s = SparkTestSession.isolated()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    s.conf.set(Dedup.CheckpointDirConf, dir)
    try {
      val out = Dedup.clusters(s, sfDir).collect().toSeq
      val base = Dedup.clusters(spark, sfDir).collect().toSeq
      assert(out === base)
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(files > 0, s"reliable checkpoint dir $dir must contain checkpointed blocks")
    } finally s.conf.unset(Dedup.CheckpointDirConf)
  }

  test("exact dedup partitions the corpus: sum of copies == doc count, keepers unique") {
    val out = Dedup.exact(spark, sfDir).cache()
    assert(out.agg(sum("n_copies")).first().getLong(0) === nDocs)
    assert(out.select("keep_id").distinct().count() === out.count())
  }

  test("bag-of-words groups are strictly-duplicated supersets of exact groups") {
    val bow = Dedup.bagOfWords(spark, sfDir).cache()
    assert(bow.where(col("n_docs") <= 1).count() === 0)
    // every exact-duplicate group (same text ⇒ same token bag) is caught
    val exactDups = Dedup.exact(spark, sfDir).where(col("n_copies") > 1)
    assert(bow.agg(sum("n_docs")).first().getLong(0) >=
      exactDups.agg(coalesce(sum("n_copies"), lit(0L))).first().getLong(0))
  }

  test("ngram Jaccard pairs are ordered, deduplicated, and within threshold") {
    val pairs = Dedup.ngramJaccard(spark, sfDir).cache()
    assert(pairs.where(col("id_a") >= col("id_b")).count() === 0)
    assert(pairs.groupBy("id_a", "id_b").count().where(col("count") > 1).count() === 0)
    assert(pairs.where(col("jaccard") < 0.8 || col("jaccard") > 1.0).count() === 0)
  }

  test("MinHash LSH finds every exact-duplicate pair with est_jaccard == 1") {
    val lsh = Dedup.minHashLsh(spark, sfDir).cache()
    // identical texts share all 128 minhashes → est_jaccard 1.0, and every
    // band collides → the pair cannot be missed
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val dupPairs = docs.as("a").join(docs.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val missed = dupPairs.join(lsh, Seq("id_a", "id_b"), "left_anti").count()
    assert(missed === 0)
    val exactOnes = dupPairs.join(lsh, Seq("id_a", "id_b"))
      .where(col("est_jaccard") < 1.0).count()
    assert(exactOnes === 0)
  }

  test("MinHash LSH recall: pairs with exact Jaccard >= 0.9 are all found") {
    // at 16 bands x 8 rows, P(miss | j=0.9) = (1 - 0.9^8)^16 ~= 2e-4 per
    // pair — with the deterministic permutations this is a fixed outcome,
    // not a flake
    val exact = Dedup.ngramJaccard(spark, sfDir).where(col("jaccard") >= 0.9)
    val lsh = Dedup.minHashLsh(spark, sfDir)
    val missed = exact.join(lsh, Seq("id_a", "id_b"), "left_anti").count()
    assert(missed === 0)
  }

  test("SimHash: identical docs pair at hamming 0; all pairs within maxHamming") {
    val pairs = Dedup.simHashPairs(spark, sfDir).cache()
    assert(pairs.where(col("hamming") > 3).count() === 0)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val dupPairs = docs.as("a").join(docs.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val wrong = dupPairs.join(pairs, Seq("id_a", "id_b"))
      .where(col("hamming") =!= 0).count()
    assert(wrong === 0)
    val missed = dupPairs.join(pairs, Seq("id_a", "id_b"), "left_anti").count()
    assert(missed === 0)
  }

  test("embedding cosine near-dup pairs are verified and symmetric-free") {
    val pairs = Dedup.embeddingCosine(spark, sfDir).cache()
    assert(pairs.where(col("id_a") >= col("id_b")).count() === 0)
    assert(pairs.where(col("cosine") < 0.4 || col("cosine") > 1.0001).count() === 0)
  }

  test("clustersOf labels every component with its min id, handles multi-hop chains") {
    import spark.implicits._
    // a 7-node path (diameter 6 — forces several propagation rounds), a
    // triangle sharing no nodes, and an isolated pair
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), (5L, 6L), (7L, 6L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L)).toDF("id_a", "id_b")
    val out = Dedup.clustersOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = (1L to 7L).map(n => (n, 1L, 7L)) ++
      Seq((20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L), (30L, 30L, 2L), (31L, 30L, 2L))
    assert(out.sorted === expect.sorted.toArray)
  }

  test("clusters partitions its nodes: labels are component-closed keepers") {
    val pairs = Dedup.minHashLsh(spark, sfDir).select("id_a", "id_b").cache()
    val cl = Dedup.clustersOf(pairs).cache()
    // every cluster's keeper is a member of the cluster
    val keepers = cl.where(col("doc_id") === col("cluster_id"))
    assert(keepers.count() === cl.select("cluster_id").distinct().count())
    // no edge crosses two clusters (labels are closed under the edge set)
    val lbl = cl.select(col("doc_id"), col("cluster_id"))
    val crossing = pairs
      .join(lbl.withColumnRenamed("doc_id", "id_a").withColumnRenamed("cluster_id", "ca"), "id_a")
      .join(lbl.withColumnRenamed("doc_id", "id_b").withColumnRenamed("cluster_id", "cb"), "id_b")
      .where(col("ca") =!= col("cb"))
    assert(crossing.count() === 0)
  }
}

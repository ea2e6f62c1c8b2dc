package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** PageRank as iterated relational algebra must equal a sequential
  * reference power iteration bit-for-bit — integer fixed-point makes
  * that equality exact regardless of partitioning or aggregation order.
  */
class GraphRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("distributed ranks equal a sequential reference, bit-for-bit") {
    val got = GraphRank.pagerank(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // sequential reference from the same rules
    val n = 500
    val edges = for {
      v <- 0 until n
      j <- 1 to (v % 3 + 1)
    } yield (v, ((v.toLong * 31 + j * 17) % n).toInt)
    var rank = Array.fill(n)(GraphRank.BaseMicro)
    for (_ <- 1 to GraphRank.Iters) {
      val inc = Array.fill(n)(0L)
      for ((u, v) <- edges) inc(v) += rank(u) / (u % 3 + 1)
      rank = Array.tabulate(n)(v => 150000L + 85L * inc(v) / 100)
    }
    assert(got.size === n)
    for (v <- 0 until n)
      assert(got(v.toLong) === rank(v), s"rank of node $v diverged")
    // sanity: mass is conserved within teleport rounding and ranks spread
    assert(rank.distinct.length > n / 10, "ranks should differentiate")
  }

  test("seeded ranks equal a sequential reference; non-seeds rank by distance") {
    val got = GraphRank.pagerankSeeded(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 500
    val seeds = (0 until n).filter(_ % 19 == 0)
    val teleport = 15L * GraphRank.BaseMicro * n / (100L * seeds.size)
    val edges = for {
      v <- 0 until n
      j <- 1 to (v % 3 + 1)
    } yield (v, ((v.toLong * 31 + j * 17) % n).toInt)
    var rank = Array.fill(n)(GraphRank.BaseMicro)
    for (_ <- 1 to GraphRank.Iters) {
      val inc = Array.fill(n)(0L)
      for ((u, v) <- edges) inc(v) += rank(u) / (u % 3 + 1)
      rank = Array.tabulate(n)(v =>
        (if (v % 19 == 0) teleport else 0L) + 85L * inc(v) / 100)
    }
    for (v <- 0 until n)
      assert(got(v.toLong) === rank(v), s"seeded rank of node $v diverged")
    // topic conditioning is visible: seeds dominate the uniform teleport
    assert(seeds.map(rank(_)).min > teleport / 2)
  }

  test("the iteration plan reuses the persisted edge list and never goes cartesian") {
    import org.apache.spark.sql.functions._
    // audit the LAZY iteration plan — the public entry materializes and
    // truncates lineage, so the loop shape is only visible here
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("node"))
    val edges = GraphRank.edgesOf(docs, docs.count())
      .repartition(col("src")).persist()
    try {
      val plan = GraphRank
        .iterated(docs, edges, "150000 + (85 * coalesce(inc, 0)) div 100")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        "every iteration must join on a key")
      assert(plan.contains("InMemoryTableScan"),
        "iterations must reuse the persisted edge list, not regenerate it")
    } finally edges.unpersist()
  }

  test("the entries release their pinned edge list before returning") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    GraphRank.pagerank(spark, sfDir)
    val leak1 = spark.sparkContext.getPersistentRDDs.keySet -- before
    // at most the returned frame's own materialized backing RDD — the
    // O(N·3)-row cached edge list must be gone
    assert(leak1.size <= 1, s"pagerank leaked cached RDDs: $leak1")
    GraphRank.pagerankSeeded(spark, sfDir)
    val leak2 = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leak2.size <= 2, s"pagerankSeeded leaked cached RDDs: $leak2")
  }
}

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

  test("the iteration plan reuses the persisted edge list and never goes cartesian") {
    val plan = GraphRank.pagerank(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "every iteration must join on a key")
    assert(plan.contains("InMemoryTableScan"),
      "iterations must reuse the persisted edge list, not regenerate it")
  }
}

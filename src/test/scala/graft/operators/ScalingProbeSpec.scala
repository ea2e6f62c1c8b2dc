package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashes
import graft.sources.Tables
import graft.testkit.SparkTestSession

/** The scaling probe's contract: the chained-hash census matches a
  * driver-side replay of the same fold (the oracle parity argument in
  * JVM form), and the plan keeps the shape the probe's purpose needs —
  * the chain must feed the GROUPING key (a global aggregate's unused
  * value expressions get pruned under the bench's `.count()` action,
  * which silently turns the probe into a bare scan), and partial
  * aggregation must reduce each scan partition to `Buckets` rows before
  * the exchange.
  */
class ScalingProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def chainJvm(orderKey: Long, lineNumber: Long): Long = {
    val p = Hashes.Prime
    var h = ((orderKey % p) * 131L + lineNumber) % p
    var i = 1L
    while (i <= ScalingProbe.ChainSteps) { h = (h * 131L + i) % p; i += 1 }
    h
  }

  test("hash-chain census matches a driver-side replay of the fold") {
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => chainJvm(r.getLong(0), r.getInt(1).toLong))
    val want = rows.groupBy(_ % ScalingProbe.Buckets).map { case (b, hs) =>
      (b, hs.length.toLong, hs.sum, hs.min, hs.max)
    }.toSeq.sortBy(_._1)
    val got = ScalingProbe.hashChain(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === want)
  }

  test("chain feeds the grouping key and aggregation is partial (map-side)") {
    val plan = ScalingProbe.hashChain(spark, sfDir)
      .queryExecution.executedPlan.toString
    // partial aggregation below the exchange: the shuffle carries
    // Buckets-sized partials, not the per-row chain values
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"expected map-side partial aggregation in:\n$plan")
    // the grouping key derives from the chain value — the structural
    // property that stops count()-driven pruning of the fold
    assert(plan.contains("aggregate("),
      s"expected the fold expression to survive optimization in:\n$plan")
  }
}

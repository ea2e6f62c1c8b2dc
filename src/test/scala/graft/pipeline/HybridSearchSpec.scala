package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** RRF fusion invariants: the fused score is exactly the sum of the
  * channel terms, rankings are well-formed, and a doc ranked by BOTH
  * channels at rank r beats a doc holding rank r in only one.
  */
class HybridSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val out = HybridSearch.rrf(spark, sfDir).cache()

  test("fused scores equal the recomputed RRF terms; ranks well-formed") {
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.toSeq === (1 to rs.length), s"q$q ranks not contiguous")
    }
    rows.foreach { r =>
      val (lex, vec) = (r.getInt(4), r.getInt(5))
      def term(rank: Int): Long =
        if (rank == 0) 0L
        else BigDecimal(1e6 / (60 + rank))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val want = BigDecimal((term(lex) + term(vec)) / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === want, s"score mismatch at ${r.getLong(0)}/${r.getLong(2)}")
      assert(lex > 0 || vec > 0, "a fused doc must come from at least one channel")
    }
  }

  test("dual-channel presence dominates a single equal-rank channel") {
    // RRF property: score(lex=r, vec=s) > score(lex=r, vec=absent)
    val rows = out.collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val dual = rs.filter(r => r.getInt(4) > 0 && r.getInt(5) > 0)
      val single = rs.filter(r => r.getInt(4) == 0 ^ r.getInt(5) == 0)
      for (d <- dual; s <- single
           if s.getInt(4).max(s.getInt(5)) >= d.getInt(4).max(d.getInt(5)))
        assert(d.getDouble(3) > s.getDouble(3),
          s"dual-channel doc ${d.getLong(2)} must outscore single-channel ${s.getLong(2)}")
    }
  }
}

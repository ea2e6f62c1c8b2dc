package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract: every declared query MUST carry a DuckDB oracle —
  * a missing oracleSql entry silently downgrades that query to a weak
  * rows-only check in the driver's correctness gate. Catch it at test time
  * instead.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("oracle SQL is non-empty and mentions a known table") {
    val tables = Seq("lineitem", "orders", "customer", "supplier", "part",
      "nation", "region", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(tables.exists(sql.contains), s"$name: oracle references no known table")
    }
  }
}

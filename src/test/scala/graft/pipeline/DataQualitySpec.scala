package graft.pipeline

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** The constraint engine must COUNT violations exactly, not just flag
  * them — each constraint class is exercised with planted dirty rows
  * (the shipped testdata is clean, so the oracle-gated entry only ever
  * proves the all-green path).
  */
class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def report(orders: Seq[(java.lang.Long, java.lang.Long, String, java.lang.Double, Timestamp)],
      parents: Seq[Long]): Map[String, (Long, Long, Boolean)] = {
    import spark.implicits._
    val o = orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate")
    val c = parents.toDF("c_custkey")
    DataQuality.reportFor(o, c).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("clean data passes every constraint with zero violations") {
    val got = report(
      Seq((1L: java.lang.Long, 10L: java.lang.Long, "O", 5.0: java.lang.Double, ts("2024-01-01 00:00:00")),
        (2L, 11L, "F", 7.5, ts("2024-01-02 00:00:00"))),
      parents = Seq(10L, 11L))
    assert(got.size === 6)
    got.foreach { case (name, (viol, total, passed)) =>
      assert(viol === 0L && total === 2L && passed, name)
    }
  }

  test("each constraint class counts its planted violations exactly") {
    val got = report(
      Seq(
        // clean row
        (1L: java.lang.Long, 10L: java.lang.Long, "O", 5.0: java.lang.Double, ts("2024-01-01 00:00:00")),
        // null custkey (completeness + NOT an RI violation: RI counts
        // only non-matching rows, and a null key never matches — both
        // engines count it, which the planted expectation pins)
        (2L, null, "F", 6.0, ts("2024-01-02 00:00:00")),
        // null orderdate
        (3L, 10L, "P", 7.0, null),
        // bad status domain
        (4L, 10L, "X", 8.0, ts("2024-01-04 00:00:00")),
        // non-positive price
        (5L, 10L, "O", -1.0, ts("2024-01-05 00:00:00")),
        // duplicated orderkey: BOTH rows count as violating rows
        (6L, 10L, "O", 9.0, ts("2024-01-06 00:00:00")),
        (6L, 10L, "O", 9.5, ts("2024-01-06 01:00:00")),
        // orphan custkey
        (7L, 99L, "O", 10.0, ts("2024-01-07 00:00:00"))),
      parents = Seq(10L))
    assert(got("completeness:o_custkey") === ((1L, 8L, false)))
    assert(got("completeness:o_orderdate") === ((1L, 8L, false)))
    assert(got("domain:o_orderstatus") === ((1L, 8L, false)))
    assert(got("range:o_totalprice_positive") === ((1L, 8L, false)))
    assert(got("uniqueness:o_orderkey") === ((2L, 8L, false)))
    // orphans: row with custkey 99 AND the null-custkey row (no parent)
    assert(got("referential:o_custkey->customer") === ((2L, 8L, false)))
  }

  test("gated entry over the real tables is all-green") {
    val rows = DataQuality.qualityReport(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getBoolean(3)), "shipped testdata must be clean")
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).toSeq.sorted)
  }
}

package graft.partition

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.testkit.PropertyChecks

/** Parity tests for the partition-ID algebra — three schemes × invalid
  * inputs, completely untested in the reference (SURVEY.md §5), plus
  * ScalaCheck round-trip properties. Fixtures per FIXTURES.md §2.
  */
class PartitionIdSpec extends AnyFunSuite with PropertyChecks {

  test("parses CURRENT scheme yyyyMMdd") {
    val p = PartitionId.parse("20260213")
    assert(p.contains(PartitionId.Current(LocalDate.of(2026, 2, 13), "20260213")))
  }

  test("parses PREVIOUS scheme yyyyMMdd-n") {
    assert(PartitionId.parse("20260213-1")
      .contains(PartitionId.Previous(LocalDate.of(2026, 2, 13), 1, "20260213-1")))
    assert(PartitionId.parse("20260213-17")
      .contains(PartitionId.Previous(LocalDate.of(2026, 2, 13), 17, "20260213-17")))
  }

  test("parses HISTORY scheme history_yyyyMMdd[-n]") {
    assert(PartitionId.parse("history_20260213")
      .contains(PartitionId.History(LocalDate.of(2026, 2, 13), None, "history_20260213")))
    assert(PartitionId.parse("history_20260213-2")
      .contains(PartitionId.History(LocalDate.of(2026, 2, 13), Some(2), "history_20260213-2")))
  }

  test("rejects invalid forms") {
    val invalid = Seq("", "2026021", "202602134x", "hist_20260213", "20260213-", "history_",
      "20261301", "20260230") // month 13, Feb 30: regex-valid but not real dates
    invalid.foreach { s =>
      assert(PartitionId.parse(s).isEmpty, s"should reject '$s'")
      assert(!PartitionId.isValid(s))
    }
    assertThrows[IllegalArgumentException](PartitionId.parseOrThrow("bogus"))
  }

  test("date-range filter is start-inclusive, end-exclusive") {
    val parts = Seq("20260101", "20260102", "20260103", "history_20260102", "junk")
    val got = PartitionId.filterByDateRange(parts,
      Some(LocalDate.of(2026, 1, 2)), Some(LocalDate.of(2026, 1, 3)))
    assert(got == Seq("20260102", "history_20260102"))
  }

  test("open-ended ranges") {
    val parts = Seq("20260101", "20260102", "20260103")
    assert(PartitionId.filterByDateRange(parts, None, None) == parts)
    assert(PartitionId.filterByDateRange(parts, Some(LocalDate.of(2026, 1, 2)), None) ==
      Seq("20260102", "20260103"))
    assert(PartitionId.filterByDateRange(parts, None, Some(LocalDate.of(2026, 1, 2))) ==
      Seq("20260101"))
  }

  test("chronological sort with lexicographic fallback for junk") {
    val got = PartitionId.sortChronologically(
      Seq("20260103", "zzz", "history_20260101", "20260102-2", "20260102", "aaa"))
    assert(got == Seq("history_20260101", "20260102", "20260102-2", "20260103", "aaa", "zzz"))
  }

  test("partitionSpec escapes quotes") {
    assert(PartitionId.partitionSpec("partition_id", "20260213") == "partition_id='20260213'")
    assert(PartitionId.partitionSpec("pc", "a'b") == "pc='a\\'b'")
  }

  private val dateGen: Gen[LocalDate] =
    Gen.choose(0L, 40000L).map(LocalDate.ofEpochDay)
  private val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")

  test("property: every generated scheme round-trips through parse") {
    forAll(dateGen, Gen.choose(0, 99), Gen.oneOf(0, 1, 2)) { (d, n, scheme) =>
      val raw = scheme match {
        case 0 => d.format(fmt)
        case 1 => s"${d.format(fmt)}-$n"
        case _ => if (n % 2 == 0) s"history_${d.format(fmt)}" else s"history_${d.format(fmt)}-$n"
      }
      val parsed = PartitionId.parse(raw)
      assert(parsed.isDefined)
      assert(parsed.get.date == d)
      assert(parsed.get.raw == raw)
    }
  }

  test("property: filterByDateRange ⊆ input and respects bounds") {
    forAll(Gen.listOf(dateGen), dateGen, Gen.choose(0L, 100L)) { (ds, start, span) =>
      val parts = ds.map(_.format(fmt))
      val end = start.plusDays(span)
      val got = PartitionId.filterByDateRange(parts, Some(start), Some(end))
      assert(got.forall(parts.contains))
      got.foreach { p =>
        val d = PartitionId.parseOrThrow(p).date
        assert(!d.isBefore(start) && d.isBefore(end))
      }
    }
  }
}

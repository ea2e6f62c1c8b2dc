package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** The metadata-aggregate rewrite: count(*)/min/max/count(col) over a
  * bare snapshot relation must come from the sidecars (a plan with NO
  * file scan) and equal the scanned answer exactly; anything that could
  * change the row set — filters, vectors, unsupported aggregates —
  * must keep the scan.
  */
class MetaAggregateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-metaagg").toString
    val df = Seq(
      (1L, Some(10L), "alpha", "2024-01-01"),
      (2L, None, "Beta", "2024-01-01"),
      (3L, Some(-5L), "gamma", "2024-01-02"),
      (4L, Some(40L), "z", "2024-01-02")
    ).toDF("id", "amount", "name", "pdate")
    VersionedTable.create(df.filter($"id" <= 2), dir, "pdate")
    VersionedTable.append(df.filter($"id" > 2), dir, "pdate")
    dir
  }
  private def load(dir: String): DataFrame =
    spark.read.format("graft-snapshot").load(dir)
  // string probe: plan `collect` does not descend into AQE wrappers, and
  // the delete-vector fallback scans via SnapshotScanRelation (a row
  // scan), not FileScan — both must count as "scanned"
  private def scanless(df: DataFrame): Boolean = {
    val s = df.queryExecution.executedPlan.toString
    !s.contains("FileScan") && !s.contains("SnapshotScanRelation")
  }

  test("count/min/max/count(col) answer from metadata with no file scan") {
    val dir = mkTable()
    val df = load(dir).agg(
      count(lit(1)).as("n"),
      count($"amount").as("n_amount"),
      min($"amount").as("mn"),
      max($"amount").as("mx"),
      min($"name").as("name_mn"),
      max($"name").as("name_mx"))
    assert(scanless(df), s"expected a metadata answer:\n${df.queryExecution}")
    val r = df.collect().head
    assert(r.getLong(0) === 4 && r.getLong(1) === 3)
    assert(r.getLong(2) === -5 && r.getLong(3) === 40)
    // unsigned UTF-8 byte order: uppercase 'B' sorts before lowercase
    assert(r.getString(4) === "Beta" && r.getString(5) === "z")
  }

  test("a filter keeps the scan; so does an unsupported aggregate") {
    val dir = mkTable()
    val filtered = load(dir).filter($"id" > 1).agg(count(lit(1)).as("n"))
    assert(!scanless(filtered), "a filter changes the row set — must scan")
    assert(filtered.collect().head.getLong(0) === 3)
    val summed = load(dir).agg(sum($"amount").as("s"))
    assert(!scanless(summed), "sum is not in the sidecars — must scan")
    assert(summed.collect().head.getLong(0) === 45)
    val distinct = load(dir).agg(countDistinct($"name").as("d"))
    assert(!scanless(distinct))
    assert(distinct.collect().head.getLong(0) === 4)
  }

  test("float/double min/max keep the scan: NaN breaks footer-stat ordering") {
    val dir = Files.createTempDirectory("graft-metaagg-nan").toString
    VersionedTable.create(Seq((1L, 1.5d, "p1"), (2L, Double.NaN, "p1"))
      .toDF("id", "v", "pdate"), dir, "pdate")
    // Spark orders NaN above every double; footer stats do not — the
    // rewrite must refuse the type entirely, not risk a wrong extremum
    val df = load(dir).agg(max($"v").as("mx"), count(lit(1)).as("n"))
    assert(!scanless(df), "double max must scan")
    val r = df.collect().head
    assert(r.getDouble(0).isNaN && r.getLong(1) === 2)
    // count(*) (row counts only, no column stats) still answers from
    // metadata; count(v) rightly scans too — the NaN file's footer
    // omits the column's stats, so its null count is untrustworthy
    val c = load(dir).agg(count(lit(1)).as("n"))
    assert(scanless(c))
    assert(c.collect().head.getLong(0) === 2)
    val cv = load(dir).agg(count($"v").as("nv"))
    assert(!scanless(cv))
    assert(cv.collect().head.getLong(0) === 2)
  }

  test("pending delete vectors never leak into a metadata answer") {
    val dir = mkTable()
    VersionedTable.deleteMergeOnRead(spark, dir, $"id" === 1L)
    val df = load(dir).agg(count(lit(1)).as("n"), max($"amount").as("mx"))
    // the vector table's read is an anti-join plan, not a bare relation:
    // the rewrite must not fire, and the answer reflects the deletion
    assert(!scanless(df))
    val r = df.collect().head
    assert(r.getLong(0) === 3 && r.getLong(1) === 40)
  }

  test("time travel answers with the version's own numbers, still scanless") {
    val dir = mkTable()
    val v0 = spark.read.format("graft-snapshot")
      .option("versionAsOf", "0").load(dir)
      .agg(count(lit(1)).as("n"), max($"id").as("mx"))
    assert(scanless(v0))
    val r = v0.collect().head
    assert(r.getLong(0) === 2 && r.getLong(1) === 2)
  }

  test("a partition-column filter folds only the matching leaves, scanless") {
    val dir = mkTable()
    val df = load(dir).filter($"pdate" === "2024-01-01").agg(count(lit(1)).as("n"))
    assert(scanless(df), s"expected a metadata answer:\n${df.queryExecution}")
    assert(df.collect().head.getLong(0) === 2)
    // a range predicate over the string partition values works too
    val range = load(dir).filter($"pdate" > "2024-01-01").agg(count(lit(1)).as("n"))
    assert(scanless(range))
    assert(range.collect().head.getLong(0) === 2)
    // min/max/count(col) under the partition filter fold the same leaves
    val mm = load(dir).filter($"pdate" === "2024-01-01")
      .agg(min($"amount").as("mn"), max($"amount").as("mx"),
        count($"amount").as("nv"))
    assert(scanless(mm), s"expected a metadata answer:\n${mm.queryExecution}")
    val r = mm.collect().head
    assert(r.getLong(0) === 10 && r.getLong(1) === 10 && r.getLong(2) === 1)
    // an empty filtered set: count 0, min/max null — still scanless
    val empty = load(dir).filter($"pdate" === "2030-01-01")
      .agg(count(lit(1)).as("n"), min($"amount").as("mn"))
    assert(scanless(empty))
    val er = empty.collect().head
    assert(er.getLong(0) === 0 && er.isNullAt(1))
    // a data-column filter keeps the scan
    val dataF = load(dir).filter($"id" > 1).agg(count(lit(1)).as("n"))
    assert(!scanless(dataF))
    assert(dataF.collect().head.getLong(0) === 3)
  }

  test("GROUP BY the partition column answers per-value counts scanless") {
    val dir = mkTable()
    val df = load(dir).groupBy($"pdate").agg(count(lit(1)).as("n"))
    assert(scanless(df), s"expected a metadata answer:\n${df.queryExecution}")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("2024-01-01" -> 2L, "2024-01-02" -> 2L))
    // grouped min/max/count(col) fold per-value sidecars
    val gmm = load(dir).groupBy($"pdate").agg(
      min($"amount").as("mn"), max($"amount").as("mx"),
      count($"amount").as("nv"))
    assert(scanless(gmm), s"expected a metadata answer:\n${gmm.queryExecution}")
    val m = gmm.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m === Map("2024-01-01" -> ((10L, 10L, 1L)),
      "2024-01-02" -> ((-5L, 40L, 2L))))
    // grouping by a data column keeps the scan
    val byName = load(dir).groupBy($"name").agg(count(lit(1)).as("n"))
    assert(!scanless(byName))
    assert(byName.count() === 4)
  }

  test("multi-column specs: filters and GROUP BY rewrite at ANY level, scanless") {
    val dir = Files.createTempDirectory("graft-metaagg-mc").toString
    val df = Seq(
      (1L, 10L, "a", "2024-01-01"), (2L, 20L, "a", "2024-01-02"),
      (3L, 30L, "b", "2024-01-01"), (4L, 40L, "b", "2024-01-02"),
      (5L, 50L, "a", "2024-01-01")
    ).toDF("id", "amount", "kind", "pdate")
    VersionedTable.create(df.filter($"id" <= 3), dir, "kind,pdate")
    VersionedTable.append(df.filter($"id" > 3), dir, "kind,pdate")
    // filter at the OUTER level
    val outer = load(dir).filter($"kind" === "a").agg(count(lit(1)).as("n"))
    assert(scanless(outer), "outer-level filter kept the scan")
    assert(outer.collect().head.getLong(0) === 3L)
    // filter at the INNER level
    val inner = load(dir).filter($"pdate" === "2024-01-01")
      .agg(count(lit(1)).as("n"), min($"amount").as("mn"))
    assert(scanless(inner), "inner-level filter kept the scan")
    val ir = inner.collect().head
    assert(ir.getLong(0) === 3L && ir.getLong(1) === 10L)
    // GROUP BY either level
    val byKind = load(dir).groupBy($"kind").agg(count(lit(1)).as("n"))
    assert(scanless(byKind))
    assert(byKind.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      === Map("a" -> 3L, "b" -> 2L))
    val byDay = load(dir).groupBy($"pdate").agg(count(lit(1)).as("n"))
    assert(scanless(byDay))
    assert(byDay.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      === Map("2024-01-01" -> 3L, "2024-01-02" -> 2L))
    // a TWO-level conjunction rewrites too: every leaf knows its full
    // value tuple, so the conjunctive fold is exactly computable
    val both = load(dir)
      .filter($"kind" === "a" && $"pdate" === "2024-01-01")
      .agg(count(lit(1)).as("n"), min($"amount").as("mn"),
        max($"amount").as("mx"))
    assert(scanless(both), "two-level filter kept the scan")
    val br = both.collect().head
    assert(br.getLong(0) === 2L && br.getLong(1) === 10L &&
      br.getLong(2) === 50L)
    // GROUP BY both levels answers per-tuple counts scanless
    val byBoth = load(dir).groupBy($"kind", $"pdate")
      .agg(count(lit(1)).as("n"), max($"amount").as("mx"))
    assert(scanless(byBoth), "two-level GROUP BY kept the scan")
    assert(byBoth.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
      === Map(("a", "2024-01-01") -> ((2L, 50L)),
        ("a", "2024-01-02") -> ((1L, 20L)),
        ("b", "2024-01-01") -> ((1L, 30L)),
        ("b", "2024-01-02") -> ((1L, 40L))))
    // a conjunct on a NON-partition column keeps the scan, still correct
    val nonPart = load(dir)
      .filter($"kind" === "a" && $"id" > 1L)
      .agg(count(lit(1)).as("n"))
    assert(!scanless(nonPart), "non-partition conjunct must keep the scan")
    assert(nonPart.collect().head.getLong(0) === 2L)
  }

  test("the rewrite equals the scan on real data at sf0.001") {
    val dir = Files.createTempDirectory("graft-metaagg-ev").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
    VersionedTable.create(events, dir, "pdate")
    val meta = load(dir).agg(count(lit(1)).as("n"),
      min($"user_id").as("mn"), max($"event_type").as("mx"))
    assert(scanless(meta))
    val m = meta.collect().head
    val e = events.agg(count(lit(1)), min($"user_id"), max($"event_type"))
      .collect().head
    assert((m.getLong(0), m.getLong(1), m.getString(2)) ===
      ((e.getLong(0), e.getLong(1), e.getString(2))))
  }
}

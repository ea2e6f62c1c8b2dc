package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Multi-column (nested) partition specs on the versioned table — the
  * Iceberg-class ordered spec: leaves nest one directory level per spec
  * column (`kind__p=a/pdate__p=2024-01-01`), the manifest records the
  * ordered list, pruning intersects per-column predicates, and COW
  * deletes rewrite exactly the affected value TUPLES. Single-column
  * tables are the depth-1 case of the same machinery (every prior spec
  * still passes).
  */
class MultiPartitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  private def fixture() = Seq(
    (1L, "a", "2024-01-01", 10L), (2L, "a", "2024-01-02", 20L),
    (3L, "b", "2024-01-01", 30L), (4L, "b", "2024-01-02", 40L),
    (5L, "a", "2024-01-01", 50L), (6L, "b", "2024-01-02", 60L)
  ).toDF("id", "kind", "pdate", "amount")

  private def makeTable(): String = {
    val dir = Files.createTempDirectory("graft-mpart").toString
    VersionedTable.create(fixture().filter($"id" <= 4), dir, "kind,pdate")
    VersionedTable.append(fixture().filter($"id" > 4), dir, "kind,pdate")
    dir
  }

  private def load(dir: String): DataFrame =
    spark.read.format("graft-snapshot").load(dir)

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  private def runCounting(df: => DataFrame): (Seq[Long], Long) = {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val frame = df
      val rows = frame.collect().map(_.getAs[Long]("id")).sorted.toSeq
      val scans = frame.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.size === 1)
      (rows, scans.head.metrics("numFiles").value)
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("nested layout: leaves carry one level per spec column, reads round-trip") {
    val dir = makeTable()
    // physical nesting: kind level above pdate level
    val v0data = new org.apache.hadoop.fs.Path(
      VersionedTable.physicalDataDir(spark, dir, 0)).toUri.getPath
    val kinds = new java.io.File(v0data).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(kinds.toSeq === Seq("kind__p=a", "kind__p=b"))
    val days = new java.io.File(s"$v0data/kind__p=a").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(days.toSeq === Seq("pdate__p=2024-01-01", "pdate__p=2024-01-02"))
    assert(ids(load(dir)) === (1L to 6L))
    assert(ids(VersionedTable.readLatest(spark, dir)) === (1L to 6L))
    // spec columns survive IN the data
    val row = load(dir).filter($"id" === 3L).collect().head
    assert(row.getAs[String]("kind") === "b")
    assert(row.getAs[String]("pdate") === "2024-01-01")
  }

  test("pruning intersects per-column predicates at both depths") {
    val dir = makeTable()
    val (all, allFiles) = runCounting(load(dir))
    assert(all === (1L to 6L))
    // level 1 (outer): kind
    val (ka, kaFiles) = runCounting(load(dir).filter($"kind" === "a"))
    assert(ka === Seq(1L, 2L, 5L))
    assert(kaFiles < allFiles, s"kind pruning: $kaFiles/$allFiles")
    // level 2 (inner): pdate
    val (d1, d1Files) = runCounting(load(dir).filter($"pdate" === "2024-01-01"))
    assert(d1 === Seq(1L, 3L, 5L))
    assert(d1Files < allFiles, s"pdate pruning: $d1Files/$allFiles")
    // intersection: both levels — strictly tighter than either alone
    val (both, bothFiles) = runCounting(
      load(dir).filter($"kind" === "a" && $"pdate" === "2024-01-01"))
    assert(both === Seq(1L, 5L))
    assert(bothFiles < kaFiles && bothFiles < d1Files,
      s"tuple pruning must intersect: $bothFiles vs $kaFiles/$d1Files")
    // range predicate on the inner level prunes too
    val (range, rangeFiles) = runCounting(
      load(dir).filter($"pdate" >= "2024-01-02"))
    assert(range === Seq(2L, 4L, 6L))
    assert(rangeFiles < allFiles)
  }

  test("COW delete rewrites exactly the affected value tuples") {
    val dir = makeTable()
    // mtime pin: untouched leaves must carry BY REFERENCE
    def leafFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/data"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val before = leafFiles()
    VersionedTable.delete(spark, dir, "kind,pdate",
      $"kind" === "a" && $"pdate" === "2024-01-01")
    assert(ids(load(dir)) === Seq(2L, 3L, 4L, 6L))
    val after = leafFiles()
    // every surviving pre-delete file is byte-untouched
    before.foreach { case (path, mtime) =>
      if (after.contains(path))
        assert(after(path) === mtime, s"leaf rewritten in place: $path")
    }
    // the (a, 2024-01-01) tuple is emptied -> no survivor leaf for it
    val (_, m) = (0, VersionedTable.readLatest(spark, dir))
    assert(m.filter($"kind" === "a" && $"pdate" === "2024-01-01").count() === 0)
    // tuple match is EXACT: (a, 2024-01-02) and (b, 2024-01-01) intact,
    // proven by time-travel equality on their rows
    assert(ids(load(dir).filter($"kind" === "a")) === Seq(2L))
    assert(ids(load(dir).filter($"pdate" === "2024-01-01")) === Seq(3L))
  }

  test("metadata count and MOR delete work through nested leaves") {
    val dir = makeTable()
    // metadata-only count from checkpointless sidecars (nested rels)
    val n = load(dir).agg(count(lit(1)).as("n"))
    assert(!n.queryExecution.executedPlan.toString.contains("FileScan"))
    assert(n.collect().head.getLong(0) === 6L)
    // merge-on-read delete is spec-agnostic; the anti-join view holds
    VersionedTable.deleteMergeOnRead(spark, dir, $"id" === 4L)
    assert(ids(load(dir)) === Seq(1L, 2L, 3L, 5L, 6L))
    // compact folds vectors back under the SAME multi-column spec
    VersionedTable.compact(spark, dir, "kind,pdate")
    assert(ids(load(dir)) === Seq(1L, 2L, 3L, 5L, 6L))
    val (_, files) = runCounting(load(dir).filter($"kind" === "b"))
    val (_, allF) = runCounting(load(dir))
    assert(files < allF, "pruning survives the compact")
  }

  test("spec evolution single->multi: old leaves are foreign, deletes migrate them") {
    val dir = Files.createTempDirectory("graft-mpart-ev").toString
    VersionedTable.create(fixture().filter($"id" <= 4), dir, "pdate")
    VersionedTable.evolvePartitionSpec(spark, dir, "kind,pdate")
    // appends now nest; old single-level leaves still read
    VersionedTable.append(fixture().filter($"id" > 4), dir, "kind,pdate")
    assert(ids(load(dir)) === (1L to 6L))
    // delete hits rows in BOTH spec generations; old-spec survivors
    // migrate to the current nested spec
    VersionedTable.delete(spark, dir, "kind,pdate", $"id".isin(1L, 5L))
    assert(ids(load(dir)) === Seq(2L, 3L, 4L, 6L))
    // appending under the OLD spec is refused loudly
    val e = intercept[IllegalArgumentException] {
      VersionedTable.append(Seq((9L, "c", "2024-01-09", 90L))
        .toDF("id", "kind", "pdate", "amount"), dir, "pdate")
    }
    assert(e.getMessage.contains("evolvePartitionSpec"))
  }

  test("merge upserts by key under a multi-column spec; tuples rewrite exactly") {
    val dir = makeTable()
    // update id=1 (may keep its tuple) and insert id=9 into a NEW tuple
    VersionedTable.merge(
      Seq((1L, "a", "2024-01-01", 99L), (9L, "c", "2024-01-03", 90L))
        .toDF("id", "kind", "pdate", "amount"), dir, "kind,pdate", "id")
    val head = load(dir)
    assert(ids(head) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L))
    assert(head.filter($"id" === 1L).collect().head
      .getAs[Long]("amount") === 99L)
    // the (b, *) tuples were untouched by the merge
    assert(ids(head.filter($"kind" === "b")) === Seq(3L, 4L, 6L))
  }

  test("binpack and maintain fold multi-leaf tuples under a multi-column spec") {
    val dir = makeTable() // create+append -> (a, 2024-01-01) has 2 leaves
    val before = VersionedTable.latestVersion(spark, dir)
    val (folded, fresh) = VersionedTable.binpack(spark, dir, "kind,pdate",
      Long.MaxValue)
    assert(folded >= 2, "the doubled tuple must fold")
    assert(fresh >= 1)
    assert(ids(load(dir)) === (1L to 6L))
    assert(VersionedTable.latestVersion(spark, dir) === before + 1)
    // maintain's debt gate groups by the full tuple
    assert(!VersionedTable.maintain(spark, dir, "kind,pdate",
      maxLeavesPerPartition = 4))
  }

  test("optimizeZOrder under a multi-column spec: content identical, " +
      "nested leaves preserved, wrong-spec call still refuses") {
    val dir = makeTable()
    val before = VersionedTable.readLatest(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    VersionedTable.optimizeZOrder(spark, dir, "kind,pdate", "id", "amount")
    val after = VersionedTable.readLatest(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after === before)
    // the rewritten layout still nests one level per spec column, so
    // tuple pruning keeps working
    assert(ids(load(dir).filter($"kind" === "a" && $"pdate" === "2024-01-01"))
      === Seq(1L, 5L))
    // and a call under a DIFFERENT spec string refuses before rewriting
    val e = intercept[IllegalArgumentException] {
      VersionedTable.optimizeZOrder(spark, dir, "kind", "id", "amount")
    }
    assert(e.getMessage.contains("spec"))
  }

  test("null values in ANY spec column refuse before the commit") {
    val dir = makeTable()
    val headBefore = VersionedTable.latestVersion(spark, dir)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.append(
        Seq((7L, "c", null.asInstanceOf[String], 70L))
          .toDF("id", "kind", "pdate", "amount"), dir, "kind,pdate")
    }
    assert(e.getMessage.contains("NULL"))
    assert(VersionedTable.latestVersion(spark, dir) === headBefore)
    assert(ids(load(dir)) === (1L to 6L))
  }

  test("plan-evidence gates throw NAMED on regression, pass on healthy counts") {
    // healthy: strict intersection ordering / strict skip
    assert(VersionedTable.requireDepth2Prune(2, 5, 12))
    assert(VersionedTable.requireOrcSkip(3, 9))
    // regression reads as a NAMED refusal, never a data-hash mismatch
    val e1 = intercept[IllegalStateException] {
      VersionedTable.requireDepth2Prune(5, 5, 12) // tuple didn't prune
    }
    assert(e1.getMessage.contains("snapshot_multicol_spec"))
    assert(e1.getMessage.contains("pruning regression"))
    val e2 = intercept[IllegalStateException] {
      VersionedTable.requireOrcSkip(9, 9) // no file skipped
    }
    assert(e2.getMessage.contains("snapshot_orc"))
    assert(e2.getMessage.contains("skip"))
  }

  test("partition values with '+' and Hive-escaped chars round-trip " +
      "through pruning and COW delete") {
    // Hive's escapePathName never escapes '+', so a URL-style decoder
    // would read "a+b" back as "a b" — pruning would drop the leaf and
    // deletes would silently miss it. ':' IS Hive-escaped (%3A), so the
    // same fixture also proves %XX decoding still works.
    val dir = Files.createTempDirectory("graft-plus").toString
    val df = Seq(
      (1L, "a+b", "x:y", 10L), (2L, "a+b", "z", 20L),
      (3L, "plain", "x:y", 30L)
    ).toDF("id", "kind", "pdate", "amount")
    VersionedTable.create(df, dir, "kind,pdate")
    assert(ids(load(dir)) === Seq(1L, 2L, 3L))
    // value-exact pruning must FIND the '+' leaf (wrong decoding loses it)
    assert(ids(load(dir).filter($"kind" === "a+b")) === Seq(1L, 2L))
    assert(ids(load(dir).filter($"pdate" === "x:y")) === Seq(1L, 3L))
    // COW delete must match the '+'-containing tuple exactly
    VersionedTable.delete(spark, dir, "kind,pdate",
      $"kind" === "a+b" && $"pdate" === "x:y")
    assert(ids(load(dir)) === Seq(2L, 3L))
    assert(ids(load(dir).filter($"kind" === "a+b")) === Seq(2L))
  }
}

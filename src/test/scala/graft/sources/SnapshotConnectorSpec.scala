package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Contract of the `graft-snapshot` read connector: format registration,
  * head + time-travel reads equal to the library read path, manifest-level
  * leaf pruning visible in the EXECUTED plan's file counts, parquet
  * pushdown intact, the delete-vector fallback path, schema-evolution
  * projection, and SQL `USING` DDL.
  */
class SnapshotConnectorSpec extends AnyFunSuite {
  // isolated SQLConf: plan probes flip AQE off around execution
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  private def fixture() = Seq(
    (1L, "a", "2024-01-01", 10L), (2L, "b", "2024-01-01", 20L),
    (3L, "a", "2024-01-02", 30L), (4L, "b", "2024-01-02", 40L),
    (5L, "a", "2024-01-03", 50L), (6L, "a", "2024-01-03", 60L)
  ).toDF("id", "kind", "pdate", "amount")

  private def makeTable(): String = {
    val dir = Files.createTempDirectory("graft-conn").toString
    val df = fixture()
    VersionedTable.create(df.filter($"id" <= 4), dir, "pdate")
    VersionedTable.append(df.filter($"id" > 4), dir, "pdate")
    dir
  }

  private def load(dir: String): DataFrame =
    spark.read.format("graft-snapshot").load(dir)

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  /** Execute with AQE off and return (rows, scan-file-count). */
  private def runCounting(df: => DataFrame): (Seq[Long], Long) = {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val frame = df
      // collect THIS frame (not a derived projection): metrics live on the
      // QueryExecution that actually ran
      val rows = frame.collect().map(_.getAs[Long]("id")).sorted.toSeq
      val scans = frame.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.size === 1, "expected the vectorized file-scan fast path")
      (rows, scans.head.metrics("numFiles").value)
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("head and versionAsOf reads match the library read path exactly") {
    val dir = makeTable()
    VersionedTable.delete(spark, dir, "pdate", $"kind" === "a" && $"pdate" === "2024-01-01")
    assert(ids(load(dir)) === ids(VersionedTable.readLatest(spark, dir)))
    for (v <- 0 to 2)
      assert(ids(spark.read.format("graft-snapshot")
        .option("versionAsOf", v.toString).load(dir)) ===
        ids(VersionedTable.readVersion(spark, dir, v)))
  }

  test("partition-value predicates prune whole leaves before the scan") {
    val dir = makeTable()
    val (allRows, allFiles) = runCounting(load(dir))
    assert(allRows === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // equality on the partition column: only that leaf's files are planned
    val (oneDay, prunedFiles) = runCounting(
      load(dir).filter($"pdate" === "2024-01-02"))
    assert(oneDay === Seq(3L, 4L))
    assert(prunedFiles < allFiles,
      s"pruned scan planned $prunedFiles files, unfiltered planned $allFiles")
    // a range predicate prunes too (generic expression evaluation)
    val (range, rangeFiles) = runCounting(
      load(dir).filter($"pdate" >= "2024-01-03"))
    assert(range === Seq(5L, 6L))
    assert(rangeFiles < allFiles)
    // non-partition predicates prune too — via the per-FILE stats (the
    // 01-01 file's amount range [10,20] cannot satisfy > 25)
    val (byAmount, amountFiles) = runCounting(load(dir).filter($"amount" > 25L))
    assert(byAmount === Seq(3L, 4L, 5L, 6L))
    assert(amountFiles === allFiles - 1)
    // a predicate no stats can decide keeps everything, correctly
    val (byKind, kindFiles) = runCounting(
      load(dir).filter($"kind" === "a" || $"kind" === "b"))
    assert(byKind === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(kindFiles === allFiles)
  }

  test("file-level min/max stats skip whole files on data-column predicates") {
    val dir = Files.createTempDirectory("graft-conn-stats").toString
    // two commits into the SAME partition: leaf pruning alone can never
    // separate them — only the per-file stats can
    VersionedTable.create(
      Seq((1L, "a", "2024-01-01", 10L), (2L, "b", "2024-01-01", 20L))
        .toDF("id", "kind", "pdate", "amount"), dir, "pdate")
    VersionedTable.append(
      Seq((3L, "c", "2024-01-01", 100L), (4L, "d", "2024-01-01", 200L))
        .toDF("id", "kind", "pdate", "amount"), dir, "pdate")
    val (all, allFiles) = runCounting(load(dir))
    assert(all === Seq(1L, 2L, 3L, 4L))
    assert(allFiles === 2)
    val (hi, hiFiles) = runCounting(load(dir).filter($"amount" > 50L))
    assert(hi === Seq(3L, 4L))
    assert(hiFiles === 1, "range predicate should plan only the high-range file")
    val (lo, loFiles) = runCounting(load(dir).filter($"amount" <= 20L))
    assert(lo === Seq(1L, 2L))
    assert(loFiles === 1)
    val (eq, eqFiles) = runCounting(load(dir).filter($"id" === 4L))
    assert(eq === Seq(4L))
    assert(eqFiles === 1)
    // string stats skip too (parquet's binary order = Spark's UTF8 order)
    val (str, strFiles) = runCounting(load(dir).filter($"kind" >= "c"))
    assert(str === Seq(3L, 4L))
    assert(strFiles === 1)
    // a predicate satisfiable in both ranges keeps both files, correctly
    val (span, spanFiles) = runCounting(load(dir).filter($"amount" >= 20L))
    assert(span === Seq(2L, 3L, 4L))
    assert(spanFiles === 2)
  }

  test("OPTIMIZE ZORDER + file stats: the connector skips files on BOTH z-columns") {
    val dir = Files.createTempDirectory("graft-conn-z").toString
    val n = 8000
    val rows = (0 until n).map(i => (i.toLong,
      if (i % 2 == 0) "p1" else "p2", (i % 400).toLong, (i.toLong * 7) % 911))
    VersionedTable.create(rows.toDF("id", "pcol", "c1", "c2"), dir, "pcol")
    VersionedTable.optimizeZOrder(spark, dir, "pcol", "c1", "c2")
    val (all, allFiles) = runCounting(load(dir))
    assert(all === rows.map(_._1).sorted)
    assert(allFiles >= 6, s"range slicing should emit several files, got $allFiles")
    // a bottom-c1 slice hits only the files whose z-range covers low c1
    val (lo, loFiles) = runCounting(load(dir).filter($"c1" < 50L))
    assert(lo === rows.filter(_._3 < 50).map(_._1).sorted)
    assert(loFiles < allFiles, s"c1 predicate planned $loFiles/$allFiles files")
    // and a top-c2 band skips too — the property a linear sort on c1
    // cannot give, now at FILE granularity, through the connector
    val (hi, hiFiles) = runCounting(load(dir).filter($"c2" >= 800L))
    assert(hi === rows.filter(_._4 >= 800).map(_._1).sorted)
    assert(hiFiles < allFiles, s"c2 predicate planned $hiFiles/$allFiles files")
  }

  test("data filters are pushed down to the parquet scan") {
    val dir = makeTable()
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scan = load(dir).filter($"amount" > 25L).queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }.head
      assert(scan.metadata("PushedFilters").contains("GreaterThan(amount,25)"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("delete-vector snapshots serve the vector-applied view; compact restores the fast path") {
    val dir = makeTable()
    VersionedTable.deleteMergeOnRead(spark, dir, $"kind" === "a" && $"amount" >= 30L)
    val dirty = load(dir)
    assert(ids(dirty) === ids(VersionedTable.readLatest(spark, dir)))
    assert(ids(dirty) === Seq(1L, 2L, 4L))
    // the fallback path is NOT a bare file scan (anti-join underneath)
    assert(dirty.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.isEmpty)
    // pushed filters + projection still correct through the fallback
    assert(dirty.filter($"amount" > 15L).select("id").as[Long].collect()
      .sorted.toSeq === Seq(2L, 4L))
    assert(dirty.filter($"kind" === "b").count() === 2)
    VersionedTable.compact(spark, dir, "pdate")
    val (rows, _) = runCounting(load(dir))
    assert(rows === Seq(1L, 2L, 4L))
  }

  test("schema evolution: connector projects every snapshot through its manifest schema") {
    val dir = makeTable()
    VersionedTable.append(
      Seq((7L, "c", "2024-01-04", 70L, "eu")).toDF("id", "kind", "pdate", "amount", "region"),
      dir, "pdate")
    val head = load(dir)
    assert(head.schema.fieldNames.toSeq.contains("region"))
    val byId = head.select("id", "region").as[(Long, Option[String])]
      .collect().toMap
    assert(byId(7L) === Some("eu"))
    assert(byId(1L) === None) // pre-evolution leaf reads null, not a failure
    // time travel to a pre-evolution version keeps the OLD schema
    val v1 = spark.read.format("graft-snapshot").option("versionAsOf", "1").load(dir)
    assert(!v1.schema.fieldNames.contains("region"))
    assert(ids(v1) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("timestampAsOf resolves to the latest commit at or before the instant") {
    val dir = Files.createTempDirectory("graft-conn-ts").toString
    val df = fixture()
    VersionedTable.create(df.filter($"id" <= 4), dir, "pdate")
    Thread.sleep(30)
    val betweenCommits = System.currentTimeMillis()
    Thread.sleep(30)
    VersionedTable.append(df.filter($"id" > 4), dir, "pdate")
    val atV0 = spark.read.format("graft-snapshot")
      .option("timestampAsOf", betweenCommits.toString).load(dir)
    assert(ids(atV0) === Seq(1L, 2L, 3L, 4L))
    // an instant after the last commit reads the head
    val atHead = spark.read.format("graft-snapshot")
      .option("timestampAsOf", (System.currentTimeMillis() + 1000).toString)
      .load(dir)
    assert(ids(atHead) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // predating the table is a loud error, not an empty frame
    val early = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot")
        .option("timestampAsOf", "1000").load(dir)
    }
    assert(early.getMessage.contains("predates"))
    // versionAsOf + timestampAsOf together refused
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").option("versionAsOf", "0")
        .option("timestampAsOf", betweenCommits.toString).load(dir)
    }
  }

  test("write path: create, append, overwrite-as-new-version, mode refusals") {
    val dir = Files.createTempDirectory("graft-conn-wr").toString + "/t"
    val df = fixture()
    // first write creates the table (partitionCol required then recorded)
    intercept[IllegalArgumentException] {
      df.filter($"id" <= 2).write.format("graft-snapshot").save(dir)
    }
    df.filter($"id" <= 2).write.format("graft-snapshot")
      .option("partitionCol", "pdate").save(dir)
    assert(ids(load(dir)) === Seq(1L, 2L))
    // append takes the spec from the manifest — no option needed
    df.filter($"id" > 2 && $"id" <= 4).write.format("graft-snapshot")
      .mode("append").save(dir)
    assert(ids(load(dir)) === Seq(1L, 2L, 3L, 4L))
    // overwrite replaces the head but HISTORY stays readable
    df.filter($"id" >= 5).write.format("graft-snapshot")
      .mode("overwrite").save(dir)
    assert(ids(load(dir)) === Seq(5L, 6L))
    assert(ids(spark.read.format("graft-snapshot").option("versionAsOf", "1")
      .load(dir)) === Seq(1L, 2L, 3L, 4L))
    // default mode (ErrorIfExists) refuses an existing table; ignore no-ops
    intercept[IllegalStateException] {
      df.write.format("graft-snapshot").save(dir)
    }
    df.filter($"id" === 1L).write.format("graft-snapshot")
      .mode("ignore").save(dir)
    assert(ids(load(dir)) === Seq(5L, 6L))
    // schema contract holds on the write path too: type drift refused
    intercept[IllegalArgumentException] {
      Seq((9L, "z", "2024-01-05", 1.5)).toDF("id", "kind", "pdate", "amount")
        .write.format("graft-snapshot").mode("append").save(dir)
    }
  }

  test("mixed partition specs: connector reads and prunes an evolved table correctly") {
    val dir = Files.createTempDirectory("graft-conn-spec").toString
    val df = fixture()
    // v0 partitioned by pdate; spec evolves to kind; v2 appends under kind
    VersionedTable.create(df.filter($"id" <= 4), dir, "pdate")
    VersionedTable.evolvePartitionSpec(spark, dir, "kind")
    VersionedTable.append(df.filter($"id" > 4), dir, "kind")
    assert(ids(load(dir)) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // a predicate on the CURRENT spec prunes new-spec leaves; old-spec
    // leaves are conservatively kept (the documented evolution cost) —
    // correctness must hold either way
    val (byKind, byKindFiles) = runCounting(load(dir).filter($"kind" === "b"))
    assert(byKind === Seq(2L, 4L))
    val (_, allFiles) = runCounting(load(dir))
    assert(byKindFiles < allFiles,
      s"kind predicate planned $byKindFiles/$allFiles files")
    // and a predicate on the OLD spec column still prunes the old leaves
    val (byDate, byDateFiles) = runCounting(load(dir).filter($"pdate" === "2024-01-01"))
    assert(byDate === Seq(1L, 2L))
    assert(byDateFiles < allFiles)
  }

  test("SQL USING DDL: the snapshot is queryable as a catalog table") {
    val dir = makeTable()
    spark.sql("DROP TABLE IF EXISTS conn_snapshot")
    spark.sql(
      s"CREATE TABLE conn_snapshot USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      val got = spark.sql(
        "SELECT pdate, CAST(sum(amount) AS BIGINT) AS total FROM conn_snapshot GROUP BY pdate ORDER BY pdate")
        .as[(String, Long)].collect().toSeq
      assert(got === Seq(("2024-01-01", 30L), ("2024-01-02", 70L), ("2024-01-03", 110L)))
    } finally spark.sql("DROP TABLE conn_snapshot")
  }

  test("SQL INSERT is refused at analysis — no manifest bypass, no dir deletion") {
    val dir = makeTable()
    spark.sql("DROP TABLE IF EXISTS conn_ins")
    spark.sql(s"CREATE TABLE conn_ins USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      val before = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
      val e1 = intercept[UnsupportedOperationException] {
        spark.sql("INSERT INTO conn_ins VALUES (9, 'z', '2024-01-09', 90)")
      }
      assert(e1.getMessage.contains("bypasses the manifest"))
      // INSERT OVERWRITE is the destructive one: the command's run()
      // deletes the output dir BEFORE writing — the analysis-time
      // refusal must land before that
      val e2 = intercept[UnsupportedOperationException] {
        spark.sql("INSERT OVERWRITE conn_ins VALUES (9, 'z', '2024-01-09', 90)")
      }
      assert(e2.getMessage.contains("bypasses the manifest"))
      // table bytes untouched: same root entries, full content readable
      assert(new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq === before)
      assert(ids(load(dir)) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    } finally spark.sql("DROP TABLE conn_ins")
  }

  private def indexOf(df: DataFrame): ManifestFileIndex =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.asInstanceOf[ManifestFileIndex]
    }.head

  test("relation construction issues ZERO per-leaf listings on a covered table") {
    val dir = makeTable()
    val covered = load(dir)
    val idx = indexOf(covered)
    assert(idx.leafListings === 0L,
      "a table whose add-dirs all carry _files.tsv must build its file " +
        "list from sidecar metadata alone — every listStatus here is a " +
        "NameNode RPC per relation build at scale")
    assert(ids(covered) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val coveredSize = idx.sizeInBytes
    assert(coveredSize > 0)

    // strip the file manifests -> legacy table: same answers, but the
    // index must fall back to one listing per leaf and say so
    val dataRoot = new java.io.File(s"$dir/data")
    val stripped = dataRoot.listFiles().filter(_.isDirectory).map { add =>
      new java.io.File(add, FileStats.FileListName).delete()
    }
    assert(stripped.forall(identity) && stripped.nonEmpty)
    val legacy = load(dir)
    val lidx = indexOf(legacy)
    assert(lidx.leafListings > 0L, "legacy add-dirs must list, not fail")
    assert(ids(legacy) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // sidecar-recorded sizes are the physical truth the planner sees
    assert(lidx.sizeInBytes === coveredSize)
  }

  test("liveDataFiles and bloom refresh answer from sidecars: zero per-leaf listings") {
    val dir = makeTable()
    VersionedTable.fallbackLeafListings = 0L
    val files = VersionedTable.liveDataFiles(spark, dir)
    assert(files.nonEmpty)
    assert(VersionedTable.fallbackLeafListings === 0L,
      "a sidecar-complete table must enumerate live files from " +
        "_files.tsv alone — maintenance paths, not just relation builds")
    // BloomSkipIndex.refresh keys on exactly this list, so index
    // maintenance inherits the zero-listing property
    val idxPath = s"$dir/bloom_sidecar.json"
    BloomSkipIndex.refresh(spark, dir, "id", idxPath)
    assert(VersionedTable.fallbackLeafListings === 0L,
      "bloom refresh must not re-list leaves on a covered table")
    // strip the sidecars -> legacy fallback lists, with identical answers
    val dataRoot = new java.io.File(s"$dir/data")
    val stripped = dataRoot.listFiles().filter(_.isDirectory).map { add =>
      new java.io.File(add, FileStats.FileListName).delete()
    }
    assert(stripped.forall(identity) && stripped.nonEmpty)
    val legacyFiles = VersionedTable.liveDataFiles(spark, dir)
    assert(VersionedTable.fallbackLeafListings > 0L,
      "legacy add-dirs must list, not fail")
    assert(legacyFiles === files,
      "sidecar and listing enumeration must agree file-for-file")
  }

  test("manifest checkpoint: relation builds read checkpoint + tail, not O(commits) sidecars") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    // 24 single-row commits -> checkpoints at v10 and v20; the head
    // relation build must pay sidecar reads only for the post-v20 TAIL
    VersionedTable.create(Seq((0L, "a", "2024-01-01", 0L))
      .toDF("id", "kind", "pdate", "amount"), dir, "pdate")
    (1 to 23).foreach { i =>
      VersionedTable.append(
        Seq((i.toLong, "a", s"2024-01-${"%02d".format(i % 5 + 1)}", i * 10L))
          .toDF("id", "kind", "pdate", "amount"), dir, "pdate")
    }
    assert(new java.io.File(s"$dir/checkpoints/v20.tsv").isFile,
      "every 10th commit must publish a checkpoint")
    assert(!new java.io.File(s"$dir/checkpoints/v10.tsv").exists(),
      "superseded checkpoints are deleted (any checkpoint caches any version)")
    val head = load(dir)
    val idx = indexOf(head)
    assert(idx.leafListings === 0L)
    assert(idx.sidecarReads <= VersionedTable.CheckpointInterval,
      s"checkpoint+tail means ≤ interval sidecar reads; got ${idx.sidecarReads}")
    assert(ids(head) === (0L to 23L))
    // evidence quality is unchanged through the checkpoint: the
    // metadata-only count rewrite still fires off the folded stats
    val n = head.agg(count(lit(1)).as("n"))
    assert(!n.queryExecution.executedPlan.toString.contains("FileScan"))
    assert(n.collect().head.getLong(0) === 24L)
    // file skipping still engages from checkpointed stats
    val (hi, hiFiles) = runCounting(load(dir).filter($"amount" >= 200L))
    assert(hi === (20L to 23L))
    val (_, allFiles) = runCounting(load(dir))
    assert(hiFiles < allFiles)
    // a checkpoint-less table pays the O(commits) fan-in (the regime
    // the checkpoint exists to kill) with identical answers
    val del = new java.io.File(s"$dir/checkpoints")
    del.listFiles().foreach(_.delete()); del.delete()
    val legacy = load(dir)
    val lidx = indexOf(legacy)
    assert(lidx.sidecarReads >= 24L, "no checkpoint -> one read per commit")
    assert(ids(legacy) === (0L to 23L))
    // time travel BEHIND the checkpoint: retired... nothing is retired
    // by appends, but an early version's roots all miss the v20-era
    // tail guarantee — correctness must hold regardless
    val v3 = spark.read.format("graft-snapshot")
      .option("versionAsOf", "3").load(dir)
    assert(ids(v3) === (0L to 3L))
  }

  test("checkpoint entries for rewritten leaves: COW delete after checkpoint stays correct") {
    val dir = Files.createTempDirectory("graft-ckpt-del").toString
    VersionedTable.create(fixture(), dir, "pdate")
    (1 to 10).foreach { i =>
      VersionedTable.append(
        Seq((100L + i, "z", "2024-01-05", 1000L + i))
          .toDF("id", "kind", "pdate", "amount"), dir, "pdate")
    }
    assert(new java.io.File(s"$dir/checkpoints/v10.tsv").isFile)
    // COW delete rewrites the 2024-01-05 leaves into a NEW add-dir (the
    // tail); the checkpoint still holds the retired leaves' entries,
    // which must simply never be consulted for the head
    VersionedTable.delete(spark, dir, "pdate", $"id" === 105L)
    val head = load(dir)
    assert(indexOf(head).leafListings === 0L)
    assert(ids(head) === Seq(1L, 2L, 3L, 4L, 5L, 6L) ++
      (101L to 110L).filterNot(_ == 105L))
    // and the PRE-delete version still reads the retired leaves (their
    // entries come from the checkpoint, sidecars or either — equal)
    val before = spark.read.format("graft-snapshot")
      .option("versionAsOf", "10").load(dir)
    assert(ids(before) === Seq(1L, 2L, 3L, 4L, 5L, 6L) ++ (101L to 110L))
  }

  test("sidecar-built file list preserves pruning, skipping and bloom probes") {
    val dir = makeTable()
    // leaf pruning by partition predicate, from sidecar-built statuses
    val (rows, files) = runCounting(
      load(dir).filter($"pdate" === "2024-01-01"))
    assert(rows === Seq(1L, 2L))
    val (_, allFiles) = runCounting(load(dir))
    assert(files < allFiles, "partition pruning must drop files")
    // file-level stats skipping on a data column still engages
    val (hi, hiFiles) = runCounting(load(dir).filter($"amount" >= 50L))
    assert(hi === Seq(5L, 6L))
    assert(hiFiles < allFiles, "footer-stats skipping must drop files")
    // metadata-only aggregate still fires (counts ride the same sidecars)
    val n = load(dir).agg(count(lit(1)).as("n"))
    val plan = n.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"))
    assert(n.collect().head.getLong(0) === 6L)
  }

  test("a small DIRTY snapshot auto-broadcasts in a join: the MOR relation reports real bytes") {
    val dir = makeTable()
    VersionedTable.deleteMergeOnRead(spark, dir, $"id" === 2L)
    val dim = load(dir) // pending vectors -> SnapshotScanRelation fallback
    assert(dim.queryExecution.executedPlan.toString
      .contains("SnapshotScanRelation"), "fixture must be on the MOR path")
    val fact = spark.range(0, 10000)
      .select(($"id" % 7 + 1).as("fk"), $"id".as("v"))
    val joined = fact.join(dim, $"fk" === dim("id"))
    val jplan = joined.queryExecution.executedPlan.toString
    // without the sizeInBytes override the relation advertises
    // defaultSizeInBytes (~Long.Max) and this would be a shuffle join
    assert(jplan.contains("BroadcastHashJoin"),
      s"small dirty snapshot must broadcast:\n$jplan")
    val got = joined.agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().head
    // result equality vs the compacted (vector-free) table
    VersionedTable.compact(spark, dir, "pdate")
    val clean = load(dir)
    val want = fact.join(clean, $"fk" === clean("id"))
      .agg(sum($"v").as("s"), count(lit(1)).as("n")).collect().head
    assert(got.getLong(0) === want.getLong(0) &&
      got.getLong(1) === want.getLong(1))
  }
}

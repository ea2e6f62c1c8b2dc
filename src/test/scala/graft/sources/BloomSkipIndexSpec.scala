package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** The bloom skipping index must never lose a row (no false negatives),
  * must actually SKIP files for layout-decorrelated keys (the capability
  * min/max skipping cannot provide), and must build deterministically.
  */
class BloomSkipIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def freshTable(): (String, String) = {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("uid", xxhash64(col("event_id")))
      .select("event_id", "uid", "user_id", "pdate")
    val dir = graft.pipeline.Stores.temp("graft_bloomspec")
    VersionedTable.create(ev, dir, "pdate")
    val index = s"$dir/index/bloom-uid.json"
    BloomSkipIndex.build(VersionedTable.readLatest(spark, dir), "uid", index)
    (dir, index)
  }

  test("lookup equals brute force for present AND absent keys") {
    val (dir, index) = freshTable()
    val table = VersionedTable.readLatest(spark, dir)
    val present = table.select("uid").orderBy("uid").limit(5)
      .collect().map(_.getLong(0)).toSeq
    val absent = Seq(123L, -987654321L, Long.MaxValue - 7)
    val keys = present ++ absent
    val (rows, scanned, total) = BloomSkipIndex.lookup(spark, index, "uid", keys)
    val got = rows.select("event_id").collect().map(_.getLong(0)).toSet
    val want = table.filter(col("uid").isin(keys: _*))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === want, "bloom pruning lost or invented rows")
    assert(want.size === 5, "the 5 present keys must all come back")
    assert(scanned <= total)
  }

  test("decorrelated keys skip most files; min/max alone could not") {
    val (dir, index) = freshTable()
    val table = VersionedTable.readLatest(spark, dir)
    // one present key from the MIDDLE of the hash domain (a boundary key
    // would be prunable by min/max alone): it lives in exactly one file,
    // while every file's uid [min,max] spans ~the whole domain (~33
    // uniform hashes per file), so min/max pruning would keep nearly
    // everything — only the bloom can prune here
    val k = table.filter(col("event_id") === 500)
      .select("uid").collect().head.getLong(0)
    val (rows, scanned, total) = BloomSkipIndex.lookup(spark, index, "uid", Seq(k))
    assert(total >= 10, s"fixture should have many files, got $total")
    assert(rows.count() === 1)
    assert(scanned <= math.max(2, total / 5),
      s"bloom should prune hard: scanned $scanned of $total")
  }

  test("keys outside the global range scan zero files") {
    val (_, index) = freshTable()
    val (rows, scanned, _) =
      BloomSkipIndex.lookup(spark, index, "uid", Seq(Long.MinValue + 1))
    assert(scanned === 0)
    assert(rows.count() === 0)
  }

  test("lifecycle: append staleness is refused; refresh indexes only new files") {
    val (dir, index) = freshTable()
    def sidecarText() = {
      val fs = new org.apache.hadoop.fs.Path(index)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new org.apache.hadoop.fs.Path(index))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val before = sidecarText()
    val nBefore = "\"file\":".r.findAllIn(before).size
    // append a fresh batch (new pdate partition → new files)
    val extra = spark.range(5).select(
      (col("id") + 900000L).as("event_id"),
      xxhash64(col("id") + 900000L).as("uid"),
      lit(1L).as("user_id"),
      lit("2030-01-01").as("pdate"))
    VersionedTable.append(extra, dir, "pdate")
    // stale sidecar: fresh lookups are refused until refresh
    val ex = intercept[IllegalArgumentException] {
      BloomSkipIndex.lookupFresh(spark, dir, index, "uid", Seq(1L))
    }
    assert(ex.getMessage.contains("refresh"))
    val (added, kept, dropped) = BloomSkipIndex.refresh(spark, dir, "uid", index)
    assert(added >= 1, "the appended partition's files must be indexed")
    assert(kept === nBefore, "pre-append entries all survive")
    assert(dropped === 0)
    // surviving entries are byte-identical (no rebuild of old files)
    val after = sidecarText()
    val entryRe = """\{"file":[^}]+\}""".r
    val oldEntries = entryRe.findAllIn(before).toSet
    val newEntries = entryRe.findAllIn(after).toSet
    assert(oldEntries.subsetOf(newEntries))
    // a key from the NEW batch is found, with pruning
    val k = spark.range(1).select(xxhash64(lit(900002L)))
      .collect().head.getLong(0)
    val (rows, scanned, total) =
      BloomSkipIndex.lookupFresh(spark, dir, index, "uid", Seq(k))
    assert(rows.select("event_id").collect().map(_.getLong(0)).toSeq
      === Seq(900002L))
    assert(scanned < total)
  }

  test("lifecycle: a delete's rewrite drops retired files from the index") {
    val (dir, index) = freshTable()
    val table = VersionedTable.readLatest(spark, dir)
    val victim = table.select("pdate").orderBy("pdate")
      .limit(1).collect().head.getString(0)
    VersionedTable.delete(spark, dir, "pdate", col("pdate") === victim)
    val (added, _, dropped) = BloomSkipIndex.refresh(spark, dir, "uid", index)
    assert(dropped >= 1, "the rewritten partition's old files must drop")
    assert(added === 0, "a pure delete rewrites nothing the index must rescan")
    // deleted rows are gone; survivors still found
    val goneUid = graft.sources.Tables.events(spark, sfDir)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(col("pdate") === victim)
      .select(xxhash64(col("event_id"))).collect().head.getLong(0)
    val (gone, _, _) = BloomSkipIndex.lookupFresh(spark, dir, index, "uid", Seq(goneUid))
    assert(gone.count() === 0)
  }

  test("two builds over the same table produce byte-identical sidecars") {
    val (dir, index) = freshTable()
    val index2 = s"$dir/index/bloom-uid-2.json"
    BloomSkipIndex.build(VersionedTable.readLatest(spark, dir), "uid", index2)
    def bytes(p: String) = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new org.apache.hadoop.fs.Path(p))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(bytes(index) === bytes(index2))
  }
}

package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Statistics must never turn ABSENCE into evidence, and layouts that
  * poison value semantics must be refused at the door:
  *   - NULL partition values are refused on the write path (hive's
  *     `__HIVE_DEFAULT_PARTITION__` sentinel would make IS NULL pruning
  *     drop exactly the matching leaf);
  *   - a footer without a null count is UNKNOWN, not 0 — IS NULL file
  *     skipping keeps the file and the count(col) metadata rewrite
  *     falls back to the scan;
  *   - float/double extrema from stats are never used as range proofs
  *     (NaN ordering), and boundsMeta refuses a NaN-bearing column
  *     loudly instead of serving a wrong bound.
  */
class StatsSoundnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  private def load(dir: String): DataFrame =
    spark.read.format("graft-snapshot").load(dir)

  private def scanless(df: DataFrame): Boolean = {
    val s = df.queryExecution.executedPlan.toString
    !s.contains("FileScan") && !s.contains("SnapshotScanRelation")
  }

  test("a batch with NULL partition values is refused before it becomes visible") {
    val dir = Files.createTempDirectory("graft-nullpart").toString
    val ok = Seq((1L, "p1"), (2L, "p2")).toDF("id", "p")
    VersionedTable.create(ok, dir, "p")
    val bad = Seq((3L, Some("p1")), (4L, None))
      .toDF("id", "p")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.append(bad, dir, "p")
    }
    assert(e.getMessage.contains("NULL values in partition column"))
    // the refused batch never committed: head unchanged, rows unchanged,
    // and the staged data dir was cleaned up
    assert(VersionedTable.latestVersion(spark, dir) === 0)
    assert(VersionedTable.readLatest(spark, dir).count() === 2)
    val dataDirs = Files.list(Paths.get(s"$dir/data")).iterator().asScala.toSeq
    assert(dataDirs.size === 1, s"refused add-dir must be deleted: $dataDirs")
  }

  test("an unknown null count keeps the file for IS NULL and fails the count(col) rewrite open") {
    val dir = Files.createTempDirectory("graft-unknownnulls").toString
    val df = Seq((1L, Some(10L), "p1"), (2L, None, "p1"), (3L, Some(30L), "p2"))
      .toDF("id", "amount", "p")
    VersionedTable.create(df, dir, "p")

    // doctor the sidecar: a writer that never recorded null counts
    // (legacy parquet) — 4th tab-separated field becomes '-'
    val addDir = Files.list(Paths.get(s"$dir/data")).iterator().asScala
      .toSeq.head
    val statsPath: JPath = addDir.resolve(FileStats.StatsFileName)
    val doctored = Files.readAllLines(statsPath).asScala.map { line =>
      val f = line.split('\t')
      (f.take(3) ++ Array("-") ++ f.drop(4)).mkString("\t")
    }
    Files.write(statsPath, doctored.mkString("\n").getBytes("UTF-8"))
    // hadoop's ChecksumFileSystem keeps a .crc sidecar — drop it so the
    // out-of-band rewrite reads back
    Files.deleteIfExists(addDir.resolve(s".${FileStats.StatsFileName}.crc"))

    // IS NULL must still find the null row — nulls-unknown files are
    // kept, never skipped on the old nulls==0 misreading
    val nulls = load(dir).filter($"amount".isNull).select("id")
      .as[Long].collect().toSeq
    assert(nulls === Seq(2L), "the file holding the NULL row was skipped")

    // count(col) = rows - nulls needs a KNOWN null count: the metadata
    // rewrite must fall back to the scan and still be right
    val cv = load(dir).agg(count($"amount").as("nv"))
    assert(!scanless(cv), "count(col) must scan when null counts are unknown")
    assert(cv.collect().head.getLong(0) === 2)

    // count(*) rides row counts alone — still scanless and right
    val c = load(dir).agg(count(lit(1)).as("n"))
    assert(scanless(c))
    assert(c.collect().head.getLong(0) === 3)

    // min/max need no null count — still scanless and right
    val mm = load(dir).agg(min($"amount").as("mn"), max($"amount").as("mx"))
    assert(scanless(mm), "min/max are provable without a null count")
    val r = mm.collect().head
    assert(r.getLong(0) === 10 && r.getLong(1) === 30)
  }

  test("ColStats never treats an absent count as zero") {
    val unknown = FileStats.ColStats(Some("1"), Some("9"), None, 10L)
    assert(!unknown.noNulls && !unknown.allNull)
    val clean = FileStats.ColStats(Some("1"), Some("9"), Some(0L), 10L)
    assert(clean.noNulls && !clean.allNull)
    val allNull = FileStats.ColStats(None, None, Some(10L), 10L)
    assert(allNull.allNull && !allNull.noNulls)
  }

  test("float/double range predicates keep every file (NaN-unsafe extrema)") {
    val dir = Files.createTempDirectory("graft-floatskip").toString
    VersionedTable.create(
      Seq((1L, 1.5d, "p1"), (2L, 2.5d, "p1"), (3L, Double.NaN, "p2"))
        .toDF("id", "v", "p"), dir, "p")
    // a range predicate over the double column must not use footer
    // min/max as a skipping proof; results stay exact either way, and
    // the NaN row obeys Spark's ordering (NaN > every double)
    val hi = load(dir).filter($"v" > 2.0).select("id")
      .as[Long].collect().sorted.toSeq
    assert(hi === Seq(2L, 3L))
  }

  test("boundsMeta refuses a NaN-bearing double column loudly") {
    val dir = Files.createTempDirectory("graft-nanbounds").toString
    VersionedTable.create(
      Seq((1L, 1.5d, "p1"), (2L, Double.NaN, "p1")).toDF("id", "v", "p"),
      dir, "p")
    val e = intercept[IllegalStateException] {
      VersionedTable.boundsMeta(spark, dir, Seq("v"))
    }
    assert(e.getMessage.contains("bounds"),
      s"expected a bounds refusal, got: ${e.getMessage}")
    // NaN-free double bounds stay served (the snapshot_bounds_meta shape)
    val dir2 = Files.createTempDirectory("graft-okbounds").toString
    VersionedTable.create(
      Seq((1L, 1.5d, "p1"), (2L, 2.5d, "p1")).toDF("id", "v", "p"),
      dir2, "p")
    val b = VersionedTable.boundsMeta(spark, dir2, Seq("v"))
    assert(b.head._2 === Some("1.5") && b.head._3 === Some("2.5"))
  }

  test("bloom lookup over an empty entry list answers an empty frame, not a crash") {
    val dir = Files.createTempDirectory("graft-bloomempty").toString
    val empty = Seq.empty[(Long, String)].toDF("uid", "payload")
    val index = s"$dir/bloom-uid.json"
    BloomSkipIndex.build(empty, "uid", index)
    val (rows, kept, total) = BloomSkipIndex.lookup(spark, index, "uid", Seq(42L))
    assert(kept === 0 && total === 0)
    assert(rows.columns.toSeq === Seq("uid", "payload"))
    assert(rows.count() === 0)
  }
}

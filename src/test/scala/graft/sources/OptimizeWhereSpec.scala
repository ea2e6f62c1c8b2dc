package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Partition-scoped OPTIMIZE (`… WHERE <partition predicate>`) and
  * N-column ZORDER — the incremental-maintenance contract at 100 TB: a
  * re-layout addresses one partition slice at a time, every
  * out-of-slice leaf carries by reference BYTE-UNTOUCHED (path, mtime
  * and length all identical), and the z-map generalizes to any arity
  * whose Morton code fits a long.
  */
class OptimizeWhereSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated()
  import spark.implicits._

  /** (path, mtime, bytes) of every data file under the given leaves —
    * the byte-untouched evidence. */
  private def fileSigs(dir: String, leaves: Seq[String])
      : Set[(String, Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val f = new Path(dir).getFileSystem(conf)
    leaves.flatMap { l =>
      f.listStatus(new Path(s"$dir/$l")).toSeq.filter(_.isFile)
        .map(st => (st.getPath.toString, st.getModificationTime,
          st.getLen))
    }.toSet
  }

  test("zorder WHERE re-lays-out only the in-slice leaves; out-of-slice " +
      "leaves carry byte-untouched and dirty vectors stay live") {
    val dir = Files.createTempDirectory("graft-optw").toString
    def batch(p: String, lo: Long) = (lo until lo + 500).map(i =>
      (i, p, i % 50, (i * 7) % 911)).toDF("id", "p", "c1", "c2")
    VersionedTable.create(batch("a", 0L), dir, "p")
    VersionedTable.append(batch("a", 500L), dir, "p")  // 2 leaves in p=a
    VersionedTable.append(batch("b", 1000L), dir, "p")
    // a MOR delete makes the p=b leaf dirty — its vector must stay live
    // across a WHERE-scoped optimize of p=a
    VersionedTable.deleteMergeOnRead(spark, dir, $"id" === 1000L)
    val before = VersionedTable.liveLeaves(spark, dir)
    val bLeaves = before.filter(_.endsWith("p__p=b"))
    val bSigs = fileSigs(dir, bLeaves)
    val rowsBefore = VersionedTable.readLatest(spark, dir)
      .orderBy("id").collect().toSeq
    assert(rowsBefore.size === 1499) // 1500 minus the MOR-deleted row

    VersionedTable.optimizeZOrderCols(spark, dir, "p", Seq("c1", "c2"),
      rowGroupBytes = 32 * 1024, where = Some("p = 'a'"))

    val after = VersionedTable.liveLeaves(spark, dir)
    assert(after.filter(_.endsWith("p__p=b")) === bLeaves,
      "out-of-slice leaves must carry by reference, path-identical")
    assert(fileSigs(dir, bLeaves) === bSigs,
      "out-of-slice bytes must be untouched (mtime and length identical)")
    assert(after.count(_.endsWith("p__p=a")) === 1,
      "the two in-slice leaves fold into one fresh leaf")
    assert(VersionedTable.readLatest(spark, dir)
      .orderBy("id").collect().toSeq === rowsBefore,
      "content is a pure representation change — the kept dirty leaf's " +
        "delete vector still applies")
    // prior version still time-travels to the pre-optimize state
    assert(VersionedTable.readVersion(spark, dir, 2).count() === 1500)
  }

  test("zorder WHERE matching no leaf is a no-op (no new version); a " +
      "non-partition-column predicate refuses naming the columns") {
    val dir = Files.createTempDirectory("graft-optw-nop").toString
    VersionedTable.create(Seq((1L, "a", 1L, 2L)).toDF("id", "p", "c1", "c2"),
      dir, "p")
    val v = VersionedTable.latestVersion(spark, dir)
    VersionedTable.optimizeZOrderCols(spark, dir, "p", Seq("c1", "c2"),
      where = Some("p = 'zzz'"))
    assert(VersionedTable.latestVersion(spark, dir) === v)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.optimizeZOrderCols(spark, dir, "p", Seq("c1", "c2"),
        where = Some("c1 > 0"))
    }
    assert(e.getMessage.contains("partition-spec columns"), e.getMessage)
    assert(e.getMessage.contains("c1"), e.getMessage)
  }

  test("binpack WHERE folds only the in-slice small-leaf debt") {
    val dir = Files.createTempDirectory("graft-bpw").toString
    def one(id: Long, p: String) = Seq((id, p)).toDF("id", "p")
    VersionedTable.create(one(1L, "a"), dir, "p")
    VersionedTable.append(one(2L, "a"), dir, "p")
    VersionedTable.append(one(3L, "b"), dir, "p")
    VersionedTable.append(one(4L, "b"), dir, "p")
    val bLeaves = VersionedTable.liveLeaves(spark, dir)
      .filter(_.endsWith("p__p=b"))
    assert(bLeaves.size === 2)
    val (folded, fresh) =
      VersionedTable.binpack(spark, dir, "p", 100 * 1024L, Some("p = 'a'"))
    assert((folded, fresh) === ((2, 1)), "only the p=a debt folds")
    val after = VersionedTable.liveLeaves(spark, dir)
    assert(after.filter(_.endsWith("p__p=b")) === bLeaves,
      "out-of-slice small leaves must not fold")
    assert(after.count(_.endsWith("p__p=a")) === 1)
  }

  test("3-column zorder: content identical, row groups skippable on all " +
      "three dims") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-z3").toString
    val n = 40000
    val df = (0 until n).map { i =>
      (i.toLong, if (i % 2 == 0) "p1" else "p2",
        (i % 2000).toLong, ((i.toLong * 7) % 911), ((i.toLong * 13) % 509))
    }.toDF("id", "pcol", "c1", "c2", "c3")
    VersionedTable.create(df, dir, "pcol")
    val before = VersionedTable.readLatest(spark, dir)
      .orderBy("id").collect().toSeq
    VersionedTable.optimizeZOrderCols(spark, dir, "pcol",
      Seq("c1", "c2", "c3"), rowGroupBytes = 32 * 1024)
    assert(VersionedTable.readLatest(spark, dir)
      .orderBy("id").collect().toSeq === before)
    // footer evidence: a bottom-slice predicate on EACH of the three
    // columns hits a strict subset of row groups — the property a
    // linear sort on any one column cannot give for the other two
    val conf = spark.sparkContext.hadoopConfiguration
    val fsys = new Path(dir).getFileSystem(conf)
    val v1Dir = VersionedTable.physicalDataDir(spark, dir, 1)
    var groups = 0
    val hits = scala.collection.mutable.Map(
      "c1" -> 0, "c2" -> 0, "c3" -> 0)
    val lows = Map("c1" -> 250L, "c2" -> 114L, "c3" -> 64L) // bottom eighth
    for (leaf <- fsys.listStatus(new Path(v1Dir)) if leaf.isDirectory;
         file <- fsys.listStatus(leaf.getPath)
         if file.getPath.getName.endsWith(".parquet")) {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(file.getPath, conf))
      try {
        for (b <- reader.getFooter.getBlocks.asScala) {
          groups += 1
          def mn(name: String): Long = b.getColumns.asScala
            .find(_.getPath.toDotString == name).get
            .getStatistics.genericGetMin.asInstanceOf[java.lang.Long]
          for ((c, lo) <- lows if mn(c) < lo) hits(c) += 1
        }
      } finally reader.close()
    }
    assert(groups >= 8, s"need multiple row groups for skipping, got $groups")
    for ((c, h) <- hits)
      assert(h > 0 && h < groups,
        s"a bottom-eighth $c predicate must skip a strict subset " +
          s"($h of $groups row groups hit)")
  }

  test("CALL graft.optimize mirrors the statement: CSV z-columns, " +
      "slice predicate, empty args = whole-table binpack") {
    val dir = Files.createTempDirectory("graft-optw-call").toString
    def batch(p: String, lo: Long) = (lo until lo + 200).map(i =>
      (i, p, i % 50, (i * 7) % 911)).toDF("id", "p", "c1", "c2")
    VersionedTable.create(batch("a", 0L), dir, "p")
    VersionedTable.append(batch("a", 200L), dir, "p")
    VersionedTable.append(batch("b", 400L), dir, "p")
    val bLeaves = VersionedTable.liveLeaves(spark, dir)
      .filter(_.endsWith("p__p=b"))
    val z = spark.sql(
      s"CALL graft.optimize('$dir', 'c1,c2,id', \"p = 'a'\")")
      .collect().head
    assert(z.getString(1) === "zorder(c1,c2,id)")
    assert(VersionedTable.liveLeaves(spark, dir)
      .filter(_.endsWith("p__p=b")) === bLeaves,
      "out-of-slice leaves must carry by reference through the CALL form")
    val bp = spark.sql(s"CALL graft.optimize('$dir', '', '')")
      .collect().head
    assert(bp.getString(1) === "binpack")
    assert(VersionedTable.readLatest(spark, dir).count() === 600L)
  }

  test("SQL: OPTIMIZE … WHERE [ZORDER BY] end-to-end; single-column and " +
      "3-column arities; malformed ZORDER refuses with a graft error") {
    val dir = Files.createTempDirectory("graft-optw-sql").toString
    def batch(p: String, lo: Long) = (lo until lo + 200).map(i =>
      (i, p, i % 50, (i * 7) % 911)).toDF("id", "p", "c1", "c2")
    VersionedTable.create(batch("a", 0L), dir, "p")
    VersionedTable.append(batch("a", 200L), dir, "p")
    VersionedTable.append(batch("b", 400L), dir, "p")
    val bLeaves = VersionedTable.liveLeaves(spark, dir)
      .filter(_.endsWith("p__p=b"))
    val z = spark.sql(
      s"OPTIMIZE graft.`$dir` WHERE p = 'a' ZORDER BY (c1, c2, id)")
      .collect().head
    assert(z.getString(1) === "zorder(c1,c2,id)")
    assert(VersionedTable.liveLeaves(spark, dir)
      .filter(_.endsWith("p__p=b")) === bLeaves)
    assert(VersionedTable.readLatest(spark, dir).count() === 600L)
    // single-column arity is a plain range-cluster — still valid
    val z1 = spark.sql(s"OPTIMIZE graft.`$dir` ZORDER BY (id)")
      .collect().head
    assert(z1.getString(1) === "zorder(id)")
    // WHERE-scoped bare OPTIMIZE (binpack) parses too
    val bp = spark.sql(s"OPTIMIZE graft.`$dir` WHERE p = 'b'")
      .collect().head
    assert(bp.getString(1) === "binpack")
    // malformed: ZORDER without parentheses refuses with a graft-named
    // error, not an unrelated Spark ParseException
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"OPTIMIZE graft.`$dir` ZORDER BY c1")
    }
    assert(e.getMessage.contains("parentheses"), e.getMessage)
    // 8 columns overflow the long z-code — loud refusal
    val e8 = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft.`$dir` " +
        "ZORDER BY (c1, c2, id, c1, c2, id, c1, c2)")
    }
    assert(e8.getMessage.contains("1 to 7"), e8.getMessage)
  }

  test("zorder on STRING and DATE columns clusters (rank-preserving " +
      "encode, never a silent all-NULL z); unsupported types refuse " +
      "loudly") {
    val dir = Files.createTempDirectory("graft-optw-str").toString
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val rows = (0 until 520).map { i =>
      val s = s"${letters(i % 26)}${letters((i / 26) % 26)}-suffix$i"
      (i.toLong, "a", s, java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(18000 + i % 400)))
    }.toDF("id", "p", "s", "d")
    VersionedTable.create(rows, dir, "p")
    VersionedTable.optimizeZOrderCols(spark, dir, "p", Seq("s"),
      rowGroupBytes = 8 * 1024, numSlices = 4)
    // single-column string zorder is a range-cluster on the string's
    // byte prefix: every output FILE must cover a disjoint s-range
    val files = VersionedTable.liveDataFiles(spark, dir)
    assert(files.size > 1, s"expected a multi-file layout, got $files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("s"), max("s")).first()
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file s-ranges overlap: $ranges")
      case _ =>
    }
    assert(VersionedTable.readLatest(spark, dir).count() === 520L)
    // date column z-encodes through days-since-epoch — commits and
    // preserves content
    VersionedTable.optimizeZOrderCols(spark, dir, "p", Seq("d", "id"),
      rowGroupBytes = 8 * 1024, numSlices = 4)
    assert(VersionedTable.readLatest(spark, dir)
      .agg(sum("id")).first().getLong(0) === (0L until 520L).sum)
    // unsupported type (array) refuses loudly, not a silent no-op layout
    val adir = Files.createTempDirectory("graft-optw-arr").toString
    VersionedTable.create(
      Seq((1L, "a", Seq(1, 2))).toDF("id", "p", "arr"), adir, "p")
    val e = intercept[UnsupportedOperationException] {
      VersionedTable.optimizeZOrderCols(spark, adir, "p", Seq("arr"))
    }
    assert(e.getMessage.contains("ZORDER"), e.getMessage)
    // a missing column refuses by name
    val em = intercept[IllegalArgumentException] {
      VersionedTable.optimizeZOrderCols(spark, adir, "p", Seq("nope"))
    }
    assert(em.getMessage.contains("nope"), em.getMessage)
  }
}

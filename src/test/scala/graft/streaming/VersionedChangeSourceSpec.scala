package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Stores
import graft.sources.VersionedTable
import graft.testkit.SparkTestSession

/** The versioned table as a streaming SOURCE
  * (`spark.readStream.format("graft-snapshot")`): versions are offsets,
  * so the contract under test is (1) first batch = full snapshot,
  * (2) subsequent batches = exactly the appended rows, (3) restart from
  * a checkpoint resumes at the committed version — nothing re-emitted,
  * nothing lost, (4) non-append commits (COW delete, MOR vectors) fail
  * LOUDLY instead of silently duplicating or missing rows, and
  * (5) `ignoreChanges` opts into the documented re-emission.
  */
class VersionedChangeSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def row(id: Long, pdate: String, amount: Long) = (id, pdate, amount)

  private def newTable(rows: (Long, String, Long)*): String = {
    val dir = Files.createTempDirectory("graft-vcs").toString
    VersionedTable.create(rows.toSeq.toDF("id", "pdate", "amount"), dir, "pdate")
    dir
  }

  private def appendRows(dir: String, rows: (Long, String, Long)*): Unit =
    VersionedTable.append(rows.toSeq.toDF("id", "pdate", "amount"), dir, "pdate")

  /** Run the change stream into a per-batch buffer; returns (query, batches). */
  private def startStream(dir: String, ckpt: String,
      extra: Map[String, String] = Map.empty) = {
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val reader = extra.foldLeft(
      spark.readStream.format("graft-snapshot")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(dir).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val got = df.select("id").collect().map(_.getLong(0)).sorted.toSeq
        if (got.nonEmpty) batches.add(got)
        ()
      }
      .start()
    (q, batches)
  }

  import scala.jdk.CollectionConverters._

  test("first batch is the snapshot; later batches are exactly the appends") {
    val dir = newTable(row(1, "2024-01-01", 10), row(2, "2024-01-02", 20))
    val (q, batches) = startStream(dir, Stores.temp("vcs-ckpt"))
    try {
      q.processAllAvailable()
      appendRows(dir, row(3, "2024-01-01", 30), row(4, "2024-01-03", 40))
      q.processAllAvailable()
      appendRows(dir, row(5, "2024-01-03", 50))
      q.processAllAvailable()
    } finally q.stop()
    assert(batches.asScala.toSeq ===
      Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L)))
  }

  test("restart from the checkpoint resumes at the committed version") {
    val dir = newTable(row(1, "2024-01-01", 10))
    val ckpt = Stores.temp("vcs-restart")
    val (q1, b1) = startStream(dir, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(b1.asScala.toSeq === Seq(Seq(1L)))
    // appends while the stream is DOWN
    appendRows(dir, row(2, "2024-01-02", 20))
    appendRows(dir, row(3, "2024-01-02", 30))
    val (q2, b2) = startStream(dir, ckpt)
    try {
      q2.processAllAvailable()
      appendRows(dir, row(4, "2024-01-01", 40))
      q2.processAllAvailable()
    } finally q2.stop()
    // rows 2+3 arrive once (catch-up range 1..3 is ONE batch — offsets
    // are version ranges), row 1 never re-emits, row 4 follows live
    assert(b2.asScala.toSeq === Seq(Seq(2L, 3L), Seq(4L)))
  }

  test("startingVersion skips the initial snapshot") {
    val dir = newTable(row(1, "2024-01-01", 10))
    appendRows(dir, row(2, "2024-01-02", 20))
    appendRows(dir, row(3, "2024-01-03", 30))
    val (q, batches) = startStream(dir, Stores.temp("vcs-sv"),
      Map("startingVersion" -> "1"))
    try q.processAllAvailable() finally q.stop()
    // versions 1..2 only — the create's row never appears
    assert(batches.asScala.toSeq === Seq(Seq(2L, 3L)))
  }

  test("a copy-on-write delete in the offset range fails loudly") {
    val dir = newTable(row(1, "2024-01-01", 10), row(2, "2024-01-02", 20))
    val (q, _) = startStream(dir, Stores.temp("vcs-cow"))
    try {
      q.processAllAvailable()
      VersionedTable.delete(spark, dir, "pdate", $"id" === 1L)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getCause.getMessage.contains("non-append change"))
    } finally q.stop()
  }

  test("a merge-on-read delete vector in the range fails loudly too") {
    val dir = newTable(row(1, "2024-01-01", 10), row(2, "2024-01-02", 20))
    val (q, _) = startStream(dir, Stores.temp("vcs-mor"))
    try {
      q.processAllAvailable()
      VersionedTable.deleteMergeOnRead(spark, dir, $"id" === 2L)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getCause.getMessage.contains("non-append change"))
    } finally q.stop()
  }

  test("end-to-end replication: change stream feeds a second versioned table exactly-once") {
    val src = newTable(row(1, "2024-01-01", 10), row(2, "2024-01-02", 20))
    val dst = Files.createTempDirectory("graft-vcs-dst").toString
    val q = spark.readStream.format("graft-snapshot").load(src).writeStream
      .option("checkpointLocation", Stores.temp("vcs-repl"))
      .foreachBatch { (df: DataFrame, bid: Long) =>
        if (VersionedTable.versions(spark, dst).isEmpty)
          VersionedTable.create(df, dst, "pdate")
        else VersionedTable.appendOnce(df, dst, "pdate", "repl", s"b$bid")
        ()
      }.start()
    try {
      q.processAllAvailable()
      appendRows(src, row(3, "2024-01-03", 30))
      q.processAllAvailable()
    } finally q.stop()
    def all(dir: String) = VersionedTable.readLatest(spark, dir)
      .select("id", "pdate", "amount").as[(Long, String, Long)]
      .collect().sorted.toSeq
    assert(all(dst) === all(src))
  }

  test("ignoreChanges re-emits rewritten survivors (the documented trade)") {
    val dir = newTable(row(1, "2024-01-01", 10), row(2, "2024-01-01", 20),
      row(3, "2024-01-02", 30))
    val (q, batches) = startStream(dir, Stores.temp("vcs-ic"),
      Map("ignoreChanges" -> "true"))
    try {
      q.processAllAvailable()
      // COW delete of id=1 rewrites the 01-01 leaf; survivor id=2 re-emits
      VersionedTable.delete(spark, dir, "pdate", $"id" === 1L)
      q.processAllAvailable()
    } finally q.stop()
    assert(batches.asScala.toSeq === Seq(Seq(1L, 2L, 3L), Seq(2L)))
  }
}

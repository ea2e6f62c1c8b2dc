package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Stores
import graft.sources.VersionedTable
import graft.testkit.SparkTestSession

/** Streaming ingestion into the versioned table: every micro-batch is one
  * committed version, replays are exactly-once (the manifest txn record
  * is the shield), and independent channels interleave without clobbering
  * each other's idempotence tracking.
  */
class StreamingVersionedSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ids(dir: String): Seq[Long] =
    VersionedTable.readLatest(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq

  private def newTable(): String = {
    val dir = Files.createTempDirectory("graft-svs").toString
    VersionedTable.create(
      Seq((1L, "2024-01-01", 10L)).toDF("id", "pdate", "amount"),
      dir, "pdate")
    dir
  }

  test("format(\"graft-snapshot\") streaming SINK: micro-batches commit " +
      "as versions, a restart from the checkpoint does not re-append, " +
      "and non-append modes / missing tables refuse") {
    val dir = newTable()
    val ckpt = Stores.temp("svs-v1sink")
    def start(in: MemoryStream[(Long, String, Long)]) =
      in.toDF().toDF("id", "pdate", "amount").writeStream
        .format("graft-snapshot")
        .option("checkpointLocation", ckpt)
        .start(dir)
    val in1 = MemoryStream[(Long, String, Long)](spark)
    val q1 = start(in1)
    try {
      in1.addData((2L, "2024-01-01", 20L), (3L, "2024-01-02", 30L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(ids(dir) === Seq(1L, 2L, 3L))
    val vAfter = VersionedTable.versions(spark, dir).size
    // restart against the SAME checkpoint: the committed epoch must not
    // re-append (checkpoint replay + the manifest txn record agree)
    val in2 = MemoryStream[(Long, String, Long)](spark)
    in2.addData((2L, "2024-01-01", 20L), (3L, "2024-01-02", 30L))
    val q2 = start(in2)
    try {
      in2.addData((4L, "2024-01-02", 40L))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(ids(dir).distinct === ids(dir), "no row may double-append")
    assert(ids(dir).contains(4L))
    // complete/update modes refuse; a missing table refuses by name
    intercept[Exception] {
      val inBad = MemoryStream[(Long, String, Long)](spark)
      inBad.toDF().toDF("id", "pdate", "amount")
        .groupBy("pdate").count().writeStream
        .format("graft-snapshot")
        .outputMode("complete")
        .option("checkpointLocation", Stores.temp("svs-v1sink-bad"))
        .start(dir)
    }
    intercept[Exception] {
      val inBad2 = MemoryStream[(Long, String, Long)](spark)
      inBad2.toDF().toDF("id", "pdate", "amount").writeStream
        .format("graft-snapshot")
        .option("checkpointLocation", Stores.temp("svs-v1sink-bad2"))
        .start(Files.createTempDirectory("graft-svs-none").toString)
    }
    assert(VersionedTable.versions(spark, dir).size >= vAfter)
  }

  test("streamed micro-batches commit as versions; snapshot equals the union") {
    val dir = newTable()
    val in = MemoryStream[(Long, String, Long)](spark)
    val q = StreamingVersionedSink.run(
      in.toDF().toDF("id", "pdate", "amount"), dir, "pdate",
      Stores.temp("svs-ckpt"))
    try {
      in.addData((2L, "2024-01-01", 20L), (3L, "2024-01-02", 30L))
      q.processAllAvailable()
      in.addData((4L, "2024-01-02", 40L))
      q.processAllAvailable()
    } finally q.stop()
    assert(ids(dir) === Seq(1L, 2L, 3L, 4L))
    // one version per micro-batch on top of the create
    assert(VersionedTable.versions(spark, dir).size >= 3)
  }

  test("a replayed (channel, batchId) append is a no-op; a new id commits") {
    val dir = newTable()
    val batch = Seq((2L, "2024-01-01", 20L)).toDF("id", "pdate", "amount")
    VersionedTable.appendOnce(batch, dir, "pdate", "stream", "b0")
    val vAfterFirst = VersionedTable.latestVersion(spark, dir)
    // the crash-replay: same channel, same batch id — must not re-append
    VersionedTable.appendOnce(batch, dir, "pdate", "stream", "b0")
    assert(VersionedTable.latestVersion(spark, dir) === vAfterFirst,
      "replayed batch must not commit a version")
    assert(ids(dir) === Seq(1L, 2L))
    // the next epoch commits normally
    VersionedTable.appendOnce(
      Seq((3L, "2024-01-02", 30L)).toDF("id", "pdate", "amount"),
      dir, "pdate", "stream", "b1")
    assert(ids(dir) === Seq(1L, 2L, 3L))
  }

  test("channels are independent: one stream's epoch does not mask another's") {
    val dir = newTable()
    VersionedTable.appendOnce(
      Seq((2L, "2024-01-01", 20L)).toDF("id", "pdate", "amount"),
      dir, "pdate", "streamA", "b0")
    // same batch id, DIFFERENT channel — a separate writer's epoch 0
    VersionedTable.appendOnce(
      Seq((3L, "2024-01-02", 30L)).toDF("id", "pdate", "amount"),
      dir, "pdate", "streamB", "b0")
    assert(ids(dir) === Seq(1L, 2L, 3L))
    // and each channel's OWN replay still no-ops
    VersionedTable.appendOnce(
      Seq((2L, "2024-01-01", 20L)).toDF("id", "pdate", "amount"),
      dir, "pdate", "streamA", "b0")
    assert(ids(dir) === Seq(1L, 2L, 3L))
  }

  test("the txn record survives unrelated mutations (delete between epochs)") {
    import org.apache.spark.sql.functions.col
    val dir = newTable()
    val batch = Seq((2L, "2024-01-01", 20L)).toDF("id", "pdate", "amount")
    VersionedTable.appendOnce(batch, dir, "pdate", "stream", "b0")
    // a takedown lands between the stream's epochs; the replay shield
    // must carry through the delete's manifest
    VersionedTable.delete(spark, dir, "pdate", col("id") === 1L)
    VersionedTable.appendOnce(batch, dir, "pdate", "stream", "b0")
    assert(ids(dir) === Seq(2L), "replay after a delete must still no-op")
  }

  test("quarantined streaming: violators route per batch, both legs exactly-once") {
    val dir = newTable()
    VersionedTable.addCheckConstraint(spark, dir, "amount_pos", "amount > 0")
    val qDir = Files.createTempDirectory("graft-svs-q").toString + "/q"
    val in = MemoryStream[(Long, String, Long)](spark)
    val q = StreamingVersionedSink.runQuarantined(
      in.toDF().toDF("id", "pdate", "amount"), dir, "pdate", qDir,
      Stores.temp("svs-q-ckpt"))
    try {
      in.addData((2L, "2024-01-01", 20L), (3L, "2024-01-01", -3L))
      q.processAllAvailable()
      in.addData((4L, "2024-01-02", -4L), (5L, "2024-01-02", 50L))
      q.processAllAvailable()
      in.addData((6L, "2024-01-03", 60L)) // clean batch: quarantine untouched
      q.processAllAvailable()
    } finally q.stop()
    assert(ids(dir) === Seq(1L, 2L, 5L, 6L))
    val quar = VersionedTable.readLatest(spark, qDir)
      .select("id", "violated_constraint").as[(Long, String)]
      .collect().toMap
    assert(quar === Map(3L -> "amount_pos", 4L -> "amount_pos"))
    // crash-replay of the LATEST quarantine-writing epoch (the only
    // epoch Structured Streaming can replay — checkpoint progress is
    // monotonic) must no-op on the quarantine leg
    val qv = VersionedTable.latestVersion(spark, qDir)
    VersionedTable.appendOnce(
      Seq((4L, "2024-01-02", -4L, "amount_pos"))
        .toDF("id", "pdate", "amount", "violated_constraint"),
      qDir, "pdate", "stream", "b1")
    assert(VersionedTable.latestVersion(spark, qDir) === qv,
      "a replay of the latest epoch must not double the quarantine rows")
  }

  test("quarantine create records its txn: replaying the creating epoch no-ops") {
    // the lazy-create crash shape in isolation: first bad batch CREATES
    // the quarantine table with (channel, b0) in its v0 manifest; a
    // replay of b0 before any further epoch must find it and no-op
    val qDir = Files.createTempDirectory("graft-svs-qc").toString + "/q"
    val bad = Seq((3L, "2024-01-01", -3L, "amount_pos"))
      .toDF("id", "pdate", "amount", "violated_constraint")
    VersionedTable.create(bad, qDir, "pdate", txn = Some(("stream", "b0")))
    VersionedTable.appendOnce(bad, qDir, "pdate", "stream", "b0")
    assert(VersionedTable.latestVersion(spark, qDir) === 0,
      "the creating epoch's replay must no-op against the v0 txn record")
    assert(VersionedTable.readLatest(spark, qDir).count() === 1)
  }
}

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
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.MaterializedView
import graft.testkit.SparkTestSession

/** Continuous MV maintenance: CDC micro-batches (inserts + deletes)
  * commit exactly-once across checkpointed restarts, and the maintained
  * view always equals a recompute over the net surviving rows.
  */
class StreamingMvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = graft.model.DeletionCriteria.parseUtc(s)

  private val cdcSchema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("op", StringType)))

  private def rows(data: (String, String, Double, String)*) = {
    import spark.implicits._
    data.toSeq.map { case (t, et, v, op) => (ts(t), et, v, op) }
      .toDF("ts", "event_type", "value", "op")
  }

  test("CDC stream maintains the view exactly-once across a checkpointed restart") {
    val base = Files.createTempDirectory("graft-smv").toString
    val (srcDir, store, ckpt) = (s"$base/src", s"$base/store", s"$base/ckpt")
    // the view needs a state/ root; start from an empty base build
    MaterializedView.buildView(
      rows().select(col("ts"), lit(0L).as("event_id"), lit(0L).as("user_id"),
        col("event_type"), col("value"), lit("").as("props")), store)
    def runOnce(): Unit = {
      val in = spark.readStream.schema(cdcSchema).parquet(srcDir)
      val q = StreamingMv.run(in, store, ckpt, Some(Trigger.AvailableNow()))
      q.awaitTermination()
    }

    rows(
      ("2024-01-10 10:05:00", "click", 1.5, "I"),
      ("2024-01-10 10:45:00", "click", 2.5, "I"),
      ("2024-01-10 11:05:00", "view", 4.0, "I")
    ).write.mode("append").parquet(srcDir)
    runOnce()

    // restart: a late batch deletes one 10h click and adds a purchase
    rows(
      ("2024-01-10 10:45:00", "click", 2.5, "D"),
      ("2024-01-10 11:20:00", "purchase", 10.0, "I")
    ).write.mode("append").parquet(srcDir)
    runOnce()

    val view = MaterializedView.readView(spark, store)
      .select("mv_hour", "event_type", "n", "sum_micros")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toList
    assert(view === List(
      ("2024-01-10 10:00:00", "click", 1L, 1500000L),
      ("2024-01-10 11:00:00", "purchase", 1L, 10000000L),
      ("2024-01-10 11:00:00", "view", 1L, 4000000L)))
  }

  test("an insert and its own delete in one batch net to zero atomically") {
    val base = Files.createTempDirectory("graft-smv-net").toString
    val store = s"$base/store"
    MaterializedView.buildView(
      rows(("2024-01-10 09:00:00", "view", 1.0, "I"))
        .select(col("ts"), lit(0L).as("event_id"), lit(0L).as("user_id"),
          col("event_type"), col("value"), lit("").as("props")), store)
    val batch = rows(
      ("2024-01-10 10:00:00", "click", 3.0, "I"),
      ("2024-01-10 10:00:00", "click", 3.0, "D"))
    MaterializedView.applyCdcBatch(batch, store, "b0")
    // replaying the same committed delta must also be a no-op
    MaterializedView.applyCdcBatch(batch, store, "b0")
    val view = MaterializedView.readView(spark, store)
    assert(view.filter(col("event_type") === "click").count() === 0)
    assert(view.count() === 1)
  }
}

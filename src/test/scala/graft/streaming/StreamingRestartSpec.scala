package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.IncrementalDedup
import graft.testkit.SparkTestSession

/** Checkpointed stop/restart coverage for the STATEFUL streaming
  * pipelines — the round-3 gap: only the stateless hourlyCounts window had
  * a restart spec. Each test runs a file-source query with
  * Trigger.AvailableNow (drain + stop), lands more files, restarts from
  * the same checkpoint, and asserts exactly-once output with state
  * restored — custom mapGroupsWithState session state, sliding-window
  * aggregate state, and the foreachBatch dedup store respectively.
  */
class StreamingRestartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = graft.model.DeletionCriteria.parseUtc(s)
  private def ev(id: Long, t: String, user: Long, typ: String = "click") =
    EventStream.Event(id, ts(t), user, typ, 1.0)
  private val eventSchema =
    org.apache.spark.sql.Encoders.product[EventStream.Event].schema

  test("sessionize restarts with its open-session state: the session closes across the restart") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-restart-sess").toString
    val (srcDir, sinkDir, ckptDir) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    def runOnce(): Unit = {
      val in = spark.readStream.schema(eventSchema).parquet(srcDir)
      val q = EventStream.sessionize(in.as[EventStream.Event])
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckptDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // run 1: user 1's session stays OPEN (nothing advances the watermark
    // past its gap deadline) — flatMapGroupsWithState must persist it
    Seq(ev(1, "2024-01-10 10:00:00", 1), ev(2, "2024-01-10 10:10:00", 1))
      .toDS().write.mode("append").parquet(srcDir)
    runOnce()
    val after1 = spark.read.parquet(sinkDir).where(col("user_id") === 1)
    assert(after1.count() === 0, "open session must not be emitted before timeout")

    // run 2 (restart): sentinels push the watermark far past the deadline;
    // the session emitted now can only come from RESTORED state — its two
    // events were committed before the restart
    Seq(ev(3, "2024-01-10 20:00:00", 99, "view"))
      .toDS().write.mode("append").parquet(srcDir)
    runOnce()
    Seq(ev(4, "2024-01-10 23:00:00", 98, "view"))
      .toDS().write.mode("append").parquet(srcDir)
    runOnce()
    val out = spark.read.parquet(sinkDir).where(col("user_id") === 1)
      .select("user_id", "session_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3))).toList
    assert(out === List((1L, 1L, ts("2024-01-10 10:00:00"), 2L)),
      s"expected exactly the restored 2-event session once, got $out")
  }

  test("trending restarts exactly-once and its finalized windows match the batch ranking") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-restart-trend").toString
    val (srcDir, sinkDir, ckptDir) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    def runOnce(): Unit = {
      val in = spark.readStream.schema(eventSchema).parquet(srcDir)
      val q = EventStream.trendingCounts(in)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckptDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    val batch1 = Seq(
      ev(1, "2024-01-10 10:05:00", 1), ev(2, "2024-01-10 10:20:00", 2),
      ev(3, "2024-01-10 10:20:00", 3, "view"), ev(4, "2024-01-10 10:50:00", 1, "purchase"),
      ev(5, "2024-01-10 16:00:00", 9, "view")) // watermark → 14:00
    batch1.toDS().write.mode("append").parquet(srcDir)
    runOnce()

    val batch2 = Seq(
      ev(6, "2024-01-10 15:05:00", 1), ev(7, "2024-01-10 15:10:00", 2),
      ev(8, "2024-01-10 22:00:00", 9, "view")) // watermark → 20:00
    batch2.toDS().write.mode("append").parquet(srcDir)
    runOnce() // restart from checkpoint

    val sunk = spark.read.parquet(sinkDir)
      .select("win_start", "event_type", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
    // exactly-once: a window emitted before the restart must not re-emit
    assert(sunk.size === sunk.toSet.size, s"duplicate windows: $sunk")
    // parity with the batch form: all windows the final watermark (20:00)
    // finalized, computed by the same definition over the full event set
    val wmCut = ts("2024-01-10 20:00:00").getTime / 1000
    val batchRef = EventStream.trendingCounts((batch1 ++ batch2).toDF())
      .where(unix_timestamp(col("win_start")) + 3600 <= wmCut)
    val want = batchRef.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(sunk.toSet === want)
    assert(sunk.nonEmpty)
    // and the top-k RANK over the restarted stream's finalized windows
    // equals the batch trending-top-k restricted to the same windows
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.partitionBy(col("win_start")).orderBy(col("n").desc, col("event_type"))
    def ranked(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
        .select("win_start", "rank", "event_type", "n").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(ranked(spark.read.parquet(sinkDir)) === ranked(batchRef))
  }

  test("attribution join restarts with its buffered click state: a post-restart purchase matches pre-restart clicks") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-restart-attr").toString
    val (clickDir, purchDir, sinkDir, ckptDir) =
      (s"$base/clicks", s"$base/purchases", s"$base/sink", s"$base/ckpt")
    // both sources must exist before the first start
    Seq(ev(10, "2024-01-10 10:00:00", 1), ev(11, "2024-01-10 10:20:00", 1),
      ev(12, "2024-01-10 09:00:00", 1), // too old for the 30 min window
      ev(13, "2024-01-10 10:20:00", 2)) // other user
      .toDS().write.mode("append").parquet(clickDir)
    spark.emptyDataset[EventStream.Event].toDF()
      .write.mode("append").parquet(purchDir)
    def runOnce(): Unit = {
      val clicks = spark.readStream.schema(eventSchema).parquet(clickDir)
      val purchases = spark.readStream.schema(eventSchema).parquet(purchDir)
      val q = EventStream.attributionJoin(purchases, clicks,
          windowMinutes = 30, watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckptDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // run 1: clicks only — they enter the join's buffered state, no output
    runOnce()
    assert(spark.read.parquet(sinkDir).count() === 0)

    // run 2 (restart): the purchase arrives — its matching clicks were
    // buffered BEFORE the restart, so matches prove the join state survived
    Seq(EventStream.Event(50, ts("2024-01-10 10:25:00"), 1, "purchase", 9.0))
      .toDS().write.mode("append").parquet(purchDir)
    runOnce()
    val out = spark.read.parquet(sinkDir)
      .select("purchase_id", "click_id", "wait_sec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out.size === out.toSet.size, s"duplicate matches: $out")
    assert(out.toSet === Set((50L, 10L, 1500L), (50L, 11L, 300L)))
  }

  test("streaming dedup restarts against its store: committed batches stay committed, new dups still match") {
    import spark.implicits._
    val corpusText =
      "the original corpus document about spark engines and their shuffle behavior"
    val freshText =
      "a completely unrelated document discussing gardens tomatoes rainfall and soil quality"
    val otherText =
      "yet another novel text about violins and concert halls tonight"
    val base = java.nio.file.Files.createTempDirectory("graft-restart-dedup").toString
    val (srcDir, storeDir, matchesDir, ckptDir) =
      (s"$base/src", s"$base/store", s"$base/matches", s"$base/ckpt")
    IncrementalDedup.buildStore(Seq((1L, corpusText)).toDF("doc_id", "text"), storeDir)
    def runOnce(): Unit = {
      val in = spark.readStream
        .schema("doc_id LONG, text STRING").parquet(srcDir)
      val q = StreamingDedup.run(in, storeDir, matchesDir, ckptDir,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
    }

    // run 1: one dup of the corpus, one fresh doc (accepted into the store)
    Seq((100L, corpusText), (101L, freshText)).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    runOnce()
    val sig1 = spark.read.parquet(IncrementalDedup.signaturesPath(storeDir))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(sig1.sorted === Seq(1L, 101L))

    // run 2 (restart): a dup of the doc accepted BEFORE the restart, plus a
    // fresh doc — the store and the checkpoint both carried over
    Seq((200L, freshText), (201L, otherText)).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    runOnce()
    val matches = spark.read.parquet(matchesDir)
      .select("new_doc_id", "corpus_doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches === Set((100L, 1L), (200L, 101L)))
    val sig2 = spark.read.parquet(IncrementalDedup.signaturesPath(storeDir))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // exactly-once store content: had the restart replayed run 1's batch,
    // 101's signature rows would be appended twice
    assert(sig2.sorted === Seq(1L, 101L, 201L),
      s"store must hold each accepted doc exactly once, got ${sig2.sorted}")
  }
}

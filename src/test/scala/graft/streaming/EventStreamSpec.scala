package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.sources.Tables
import graft.testkit.SparkTestSession

/** Streaming surface checks: batch/streaming parity for the windowed
  * aggregate (one query definition serves backfill and tail), and
  * MemoryStream-driven micro-batch runs for watermark finalization,
  * stateful sessionization, and watermarked dedup.
  */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // UTC-instant parse: Timestamp.valueOf would shift by the driver-default
  // zone and break the UTC-formatted hour/watermark assertions on any
  // non-UTC driver (the exact drift DeletionCriteria.parseUtc exists for)
  private def ts(s: String) = graft.model.DeletionCriteria.parseUtc(s)

  test("file-source restart: exactly-once windows across a checkpointed stop/restart") {
    // the recovery contract a daily pipeline leans on: a file-stream run of
    // hourlyCounts is stopped, more files land, the query restarts from its
    // checkpoint — previously emitted windows must NOT re-emit (no
    // reprocessing of committed files, state restored), new windows emit
    // once, and a beyond-watermark late file is dropped
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val (srcDir, sinkDir, ckptDir) = (s"$base/src", s"$base/sink", s"$base/ckpt")

    def ev(id: Long, t: String, typ: String) =
      EventStream.Event(id, ts(t), 1L, typ, 1.0)
    def runOnce(): Unit = {
      val in = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[EventStream.Event]].schema)
        .parquet(srcDir)
      val q = EventStream.hourlyCounts(in)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckptDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // run 1: hours 00/01 + a 05:00 sentinel → watermark 03:00 finalizes 00, 01
    Seq(ev(1, "2024-01-01 00:10:00", "click"), ev(2, "2024-01-01 00:20:00", "click"),
      ev(3, "2024-01-01 00:40:00", "click"), ev(4, "2024-01-01 01:05:00", "click"),
      ev(5, "2024-01-01 01:30:00", "click"), ev(6, "2024-01-01 05:00:00", "view"))
      .toDS().write.mode("append").parquet(srcDir)
    runOnce()
    val after1 = spark.read.parquet(sinkDir).select("hour", "event_type", "n")
      .as[(String, String, Long)].collect().toSet
    assert(after1 === Set(("2024-01-01 00:00:00", "click", 3L),
      ("2024-01-01 01:00:00", "click", 2L)))

    // stop happened (AvailableNow drained); land late + new + sentinel files
    Seq(ev(7, "2024-01-01 02:15:00", "click"), // LATE: behind the 03:00 watermark
      ev(8, "2024-01-01 03:10:00", "purchase"), ev(9, "2024-01-01 03:55:00", "purchase"),
      ev(10, "2024-01-01 09:00:00", "view")) // advances watermark to 07:00
      .toDS().write.mode("append").parquet(srcDir)
    runOnce() // restart from checkpoint
    val after2 = spark.read.parquet(sinkDir).select("hour", "event_type", "n")
      .as[(String, String, Long)].collect().toList
    // exactly-once: run 2 added finalized 03 and 05 only; 00/01 not re-emitted,
    // the late hour-02 event dropped, hour 09 still open in state
    assert(after2.size === after2.toSet.size, s"duplicate windows emitted: $after2")
    assert(after2.toSet === Set(
      ("2024-01-01 00:00:00", "click", 3L), ("2024-01-01 01:00:00", "click", 2L),
      ("2024-01-01 03:00:00", "purchase", 2L), ("2024-01-01 05:00:00", "view", 1L)))
  }

  test("hourlyCounts on a batch frame matches the batch eventsHourly operator") {
    val batch = Analytics.eventsHourly(spark, sfDir)
    val viaStreamingDef = EventStream.hourlyCounts(Tables.events(spark, sfDir))
    assert(batch.exceptAll(viaStreamingDef).isEmpty &&
      viaStreamingDef.exceptAll(batch).isEmpty)
  }

  test("sessionizeBatch matches the batch lag/cumsum sessionize operator") {
    val batch = Analytics.sessionize(spark, sfDir)
    val stateful = EventStream.sessionizeBatchSummary(spark, sfDir)
    assert(batch.exceptAll(stateful).isEmpty && stateful.exceptAll(batch).isEmpty)
  }

  test("sessionizeBatch emits the final open session that streaming holds back") {
    import spark.implicits._
    val events = Seq(
      EventStream.Event(1, ts("2024-01-10 10:00:00"), 1, "click", 1.0),
      EventStream.Event(2, ts("2024-01-10 10:10:00"), 1, "click", 1.0)).toDS()
    val out = EventStream.sessionizeBatch(events).collect()
    assert(out.toSeq === Seq(
      EventStream.SessionSummary(1L, 1L, ts("2024-01-10 10:00:00"), 2L)))
  }

  test("streaming hourlyCounts finalizes windows once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.hourlyCounts(in.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("hourly_sink")
      .outputMode("append").start()
    try {
      in.addData(
        EventStream.Event(1, ts("2024-01-10 10:05:00"), 1, "click", 10.0),
        EventStream.Event(2, ts("2024-01-10 10:45:00"), 2, "view", 5.0),
        EventStream.Event(3, ts("2024-01-10 10:50:00"), 1, "click", 2.5))
      q.processAllAvailable()
      // two sentinel batches: the first advances max event time, the second
      // computes a watermark from it that passes the 11:00 window end
      in.addData(EventStream.Event(4, ts("2024-01-10 16:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      in.addData(EventStream.Event(5, ts("2024-01-10 16:01:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("hourly_sink")
        .select("hour", "event_type", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(out === Set(
        ("2024-01-10 10:00:00", "click", 2L, 12.5),
        ("2024-01-10 10:00:00", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming trendingCounts finalizes the same sliding windows the batch form ranks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.trendingCounts(in.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("trend_sink")
      .outputMode("append").start()
    try {
      val events = Seq(
        EventStream.Event(1, ts("2024-01-10 10:05:00"), 1, "click", 1.0),
        EventStream.Event(2, ts("2024-01-10 10:20:00"), 2, "click", 1.0),
        EventStream.Event(3, ts("2024-01-10 10:20:00"), 3, "view", 1.0),
        EventStream.Event(4, ts("2024-01-10 10:50:00"), 1, "purchase", 1.0))
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(EventStream.Event(9, ts("2024-01-10 16:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      in.addData(EventStream.Event(10, ts("2024-01-10 16:01:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("trend_sink")
        .select("win_start", "event_type", "n").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // expectation from first principles: each event covers starts
      // (sec/900 - j)*900, j=0..3; only windows fully below the 14:00
      // watermark (end <= 14:00) have been emitted
      def fmt(sec: Long) = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(sec))
      val expanded = events.flatMap { e =>
        val sec = e.ts.getTime / 1000
        (0 to 3).map(j => ((sec / 900 - j) * 900, e.event_type))
      }
      val want = expanded.groupBy(identity).toSeq
        .map { case ((ws, typ), xs) => (ws, typ, xs.length.toLong) }
        .filter { case (ws, _, _) => ws + 3600 <= ts("2024-01-10 14:00:00").getTime / 1000 }
        .map { case (ws, typ, n) => (fmt(ws), typ, n) }.toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("trending foreachBatch ranks finalized windows like the batch form") {
    // the full streaming top-k pattern the operator doc promises: the
    // Append-mode sliding aggregate emits FINALIZED windows; foreachBatch
    // ranks each batch's windows (complete by construction once emitted)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    val in = MemoryStream[EventStream.Event]
    val sink = collection.mutable.ArrayBuffer.empty[(String, Int, String, Long)]
    val q = EventStream.trendingCounts(in.toDF(), watermark = "2 hours")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val w = Window.partitionBy(col("win_start"))
          .orderBy(col("n").desc, col("event_type"))
        val ranked = batch.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
          .select("win_start", "rank", "event_type", "n").collect()
        sink.synchronized {
          sink ++= ranked.map(r =>
            (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
        }
        ()
      }
      .outputMode("append").start()
    try {
      val events = Seq(
        EventStream.Event(1, ts("2024-01-10 10:05:00"), 1, "click", 1.0),
        EventStream.Event(2, ts("2024-01-10 10:20:00"), 2, "click", 1.0),
        EventStream.Event(3, ts("2024-01-10 10:20:00"), 3, "view", 1.0),
        EventStream.Event(4, ts("2024-01-10 10:50:00"), 1, "purchase", 1.0))
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(EventStream.Event(9, ts("2024-01-10 16:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      in.addData(EventStream.Event(10, ts("2024-01-10 16:01:00"), 9, "view", 0.0))
      q.processAllAvailable()
      // batch reference: rank the SAME events' sliding windows, keep only
      // windows the watermark (14:00) finalized
      val wmCut = ts("2024-01-10 14:00:00").getTime / 1000
      val batchRef = EventStream.trendingCounts(events.toDF())
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("win_start")).orderBy(col("n").desc, col("event_type"))))
        .where(col("rank") <= 3)
        .where(unix_timestamp(col("win_start")) + 3600 <= wmCut)
        .select("win_start", "rank", "event_type", "n").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      assert(batchRef.nonEmpty)
      assert(sink.synchronized(sink.toSet) === batchRef)
    } finally q.stop()
  }

  test("session_window: exact-gap event MERGES (split is strictly > gap); streaming finalizes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = in.toDF()
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
      .writeStream.format("memory").queryName("sw_sink")
      .outputMode("append").start()
    try {
      in.addData(
        EventStream.Event(1, ts("2024-01-10 10:00:00"), 1, "click", 1.0),
        EventStream.Event(2, ts("2024-01-10 10:29:59"), 1, "click", 1.0), // merges
        EventStream.Event(3, ts("2024-01-10 10:59:59"), 1, "click", 1.0), // exactly at window end → MERGES
        EventStream.Event(5, ts("2024-01-10 11:30:00"), 1, "click", 1.0), // 1s past end → NEW
        EventStream.Event(4, ts("2024-01-10 10:05:00"), 2, "view", 1.0))
      q.processAllAvailable()
      in.addData(EventStream.Event(8, ts("2024-01-10 18:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      in.addData(EventStream.Event(9, ts("2024-01-10 18:01:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("sw_sink")
        .select("user_id", "session_start", "session_end", "n_events").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      // events 1+2+3 merge (3 sits exactly at the merged window's end —
      // inclusive for merging); event 5 at 11:30:00 is 1 s past the
      // extended end 11:29:59, so it opens a new session
      assert(got === Set(
        (1L, "2024-01-10 10:00:00", "2024-01-10 11:29:59", 3L),
        (1L, "2024-01-10 11:30:00", "2024-01-10 12:00:00", 1L),
        (2L, "2024-01-10 10:05:00", "2024-01-10 10:35:00", 1L)))
      // and the batch oracle form agrees on the same fixture
      val batchGot = Seq(
        EventStream.Event(1, ts("2024-01-10 10:00:00"), 1, "click", 1.0),
        EventStream.Event(2, ts("2024-01-10 10:29:59"), 1, "click", 1.0),
        EventStream.Event(3, ts("2024-01-10 10:59:59"), 1, "click", 1.0),
        EventStream.Event(5, ts("2024-01-10 11:30:00"), 1, "click", 1.0),
        EventStream.Event(4, ts("2024-01-10 10:05:00"), 2, "view", 1.0)).toDS()
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("s"),
          col("n")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(batchGot === Set(
        (1L, "2024-01-10 10:00:00", 3L),
        (1L, "2024-01-10 11:30:00", 1L),
        (2L, "2024-01-10 10:05:00", 1L)))
    } finally q.stop()
  }

  test("stream-static enrichment join matches the batch join, keeps dimension-less events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, 10L), (2L, 20L)).toDF("c_custkey", "c_nationkey")
    val events = Seq(
      EventStream.Event(1, ts("2024-01-10 10:00:00"), 1, "click", 1.0),
      EventStream.Event(2, ts("2024-01-10 10:01:00"), 2, "view", 2.0),
      EventStream.Event(3, ts("2024-01-10 10:02:00"), 7, "click", 3.0)) // no dim row
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.enrichJoin(in.toDF(), dim)
      .select(col("event_id"), col("user_id"), col("c_nationkey"))
      .writeStream.format("memory").queryName("enrich_sink")
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("enrich_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      val batch = EventStream.enrichJoin(events.toDF(), dim)
        .select(col("event_id"), col("user_id"), col("c_nationkey")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed === Set((1L, 1L, 10L), (2L, 2L, 20L), (3L, 7L, -1L)),
        "the left join must keep the event with no dimension row")
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap and on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(in.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("session_sink")
      .outputMode("append").start()
    try {
      in.addData(
        // user 1: 3-event session, then a >30min gap opens session 2
        EventStream.Event(1, ts("2024-01-10 10:00:00"), 1, "click", 1.0),
        EventStream.Event(2, ts("2024-01-10 10:10:00"), 1, "click", 1.0),
        EventStream.Event(3, ts("2024-01-10 10:20:00"), 1, "click", 1.0),
        EventStream.Event(4, ts("2024-01-10 12:00:00"), 1, "click", 1.0),
        EventStream.Event(5, ts("2024-01-10 12:05:00"), 1, "click", 1.0),
        // user 2: single-event session
        EventStream.Event(6, ts("2024-01-10 10:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      // advance the watermark far past every open session's gap deadline
      in.addData(EventStream.Event(7, ts("2024-01-10 20:00:00"), 99, "view", 0.0))
      q.processAllAvailable()
      in.addData(EventStream.Event(8, ts("2024-01-10 20:01:00"), 99, "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("session_sink")
        .where(col("user_id") =!= 99)
        .select("user_id", "session_id", "session_start", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3))).toSet
      assert(out === Set(
        (1L, 1L, ts("2024-01-10 10:00:00"), 3L),
        (1L, 2L, ts("2024-01-10 12:00:00"), 2L),
        (2L, 1L, ts("2024-01-10 10:00:00"), 1L)))
    } finally q.stop()
  }

  test("stream-stream attribution join matches clicks in-window, per user, incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventStream.Event]
    val purchases = MemoryStream[EventStream.Event]
    val q = EventStream.attributionJoin(purchases.toDF(), clicks.toDF(),
        windowMinutes = 30, watermark = "1 hour")
      .writeStream.format("memory").queryName("attr_sink")
      .outputMode("append").start()
    try {
      clicks.addData(
        EventStream.Event(10, ts("2024-01-10 10:00:00"), 1, "click", 1.0),
        EventStream.Event(11, ts("2024-01-10 10:20:00"), 1, "click", 1.0),
        EventStream.Event(12, ts("2024-01-10 09:00:00"), 1, "click", 1.0), // too old
        EventStream.Event(13, ts("2024-01-10 10:20:00"), 2, "click", 1.0)) // other user
      q.processAllAvailable()
      // purchase arrives AFTER its clicks were buffered — incremental match
      purchases.addData(EventStream.Event(50, ts("2024-01-10 10:25:00"), 1, "purchase", 9.0))
      q.processAllAvailable()
      val out = spark.table("attr_sink")
        .select("purchase_id", "click_id", "wait_sec").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out === Set((50L, 10L, 1500L), (50L, 11L, 300L)))
    } finally q.stop()
  }

  test("attribution batch form equals an independent pair filter of the raw events") {
    val got = EventStream.attributionBatch(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val expected = p.join(c, "user_id")
      .where(col("cts") <= col("pts") &&
        col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES"))
    assert(got.count() === expected.count())
    assert(got.where(col("wait_sec") < 0 || col("wait_sec") > 1800).count() === 0)
  }

  test("watermarked dedup drops in-horizon duplicate event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.dedupEvents(in.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try {
      in.addData(
        EventStream.Event(1, ts("2024-01-10 10:00:00"), 1, "click", 1.0),
        EventStream.Event(1, ts("2024-01-10 10:00:30"), 1, "click", 1.0), // dup id
        EventStream.Event(2, ts("2024-01-10 10:01:00"), 2, "view", 1.0))
      q.processAllAvailable()
      in.addData(EventStream.Event(1, ts("2024-01-10 10:02:00"), 1, "click", 1.0)) // dup id
      q.processAllAvailable()
      val ids = spark.table("dedup_sink").select("event_id").collect().map(_.getLong(0)).toSeq
      assert(ids.sorted === Seq(1L, 2L))
    } finally q.stop()
  }
}

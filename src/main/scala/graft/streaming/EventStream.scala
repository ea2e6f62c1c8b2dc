package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Structured Streaming surface over the `events` stream — the streaming
  * counterparts of [[graft.operators.Analytics.eventsHourly]] and
  * [[graft.operators.Analytics.sessionize]], plus watermarked exactly-once
  * event dedup. The reference is pure batch (SURVEY.md §1.4: no streaming
  * anywhere), so this module is extension surface: the same event-table
  * semantics, incrementally maintained.
  *
  * [[hourlyCounts]] and [[dedupEvents]] work UNCHANGED on a batch frame
  * (watermarks are no-ops in batch). [[sessionize]] is the one exception:
  * batch execution never fires EventTimeTimeout, so open sessions would be
  * dropped — its backfill form is [[sessionizeBatch]], built on the same
  * session fold. The parity suite and the DuckDB oracle pin all of them to
  * the batch operators in [[graft.operators.Analytics]]: one set of
  * semantics, backfill in batch, tail in streaming.
  *
  * Scale notes: all three ops shuffle once on their grouping key and keep
  * state bounded by the watermark — state store size is O(active windows +
  * open sessions + in-watermark event ids), independent of stream length.
  */
object EventStream {

  /** Hourly tumbling-window aggregate with a late-data watermark.
    * Streaming: emits finalized windows in Append mode once the watermark
    * passes window end. Batch: identical result to Analytics.eventsHourly.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Watermarked exactly-once dedup on event_id: duplicates arriving within
    * the watermark horizon are dropped; state holds only in-horizon ids.
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Sliding-window trending counts (1 h window, 15 min slide): the
    * streaming-compatible half of a "trending now" query — a watermarked
    * Append-mode aggregate; each event lands in exactly 4 overlapping
    * windows (window/slide = 4, the fan-out is a constant, not data).
    * The top-k RANK over a window needs that window CLOSED, so in
    * streaming it runs downstream of this frame (foreachBatch over
    * finalized windows — the standard pattern, rank-over-updating-state
    * is not expressible in Append mode); in batch, [[trendingTopKBatch]]
    * ranks directly and carries the oracle.
    */
  def trendingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"))

  /** [[trendingCounts]] over the events table, ranked to the per-window
    * top-k (count desc, event_type tiebreak). Scale: the rank runs per
    * win_start partition via WindowGroupLimit; the count aggregate is the
    * only corpus-sized shuffle (4 rows per event after map-side combine).
    */
  def trendingTopKBatch(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.partitionBy(col("win_start")).orderBy(col("n").desc, col("event_type"))
    trendingCounts(Tables.events(spark, sfDir))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("win_start"), col("rank"), col("event_type"), col("n"))
      .orderBy("win_start", "rank")
  }

  /** Oracle for [[trendingTopKBatch]] — each event expanded to its 4
    * sliding windows by integer epoch-second arithmetic (start = (sec ÷
    * 900 − j)·900, j ∈ 0..3), exactly Spark's epoch-aligned window
    * assignment; timestamps stay in integer seconds end-to-end.
    */
  def trendingTopKBatchSql(k: Int = 3): String =
    s"""WITH expanded AS (
       |  SELECT event_type,
       |    strftime(make_timestamp(
       |      ((epoch_us(ts::TIMESTAMP) // 1000000) // 900 - j) * 900 * 1000000),
       |      '%Y-%m-%d %H:%M:%S') AS win_start
       |  FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) offs),
       |counted AS (
       |  SELECT win_start, event_type, count(*) AS n
       |  FROM expanded GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY win_start
       |                               ORDER BY n DESC, event_type) AS rank
       |  FROM counted)
       |SELECT win_start, rank, event_type, n
       |FROM ranked WHERE rank <= $k ORDER BY win_start, rank""".stripMargin

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(sessionId: Long, start: Timestamp, last: Timestamp,
      nEvents: Long)

  case class SessionSummary(user_id: Long, session_id: Long,
      session_start: Timestamp, n_events: Long)

  val SessionGapSeconds: Long = 1800L

  /** The shared session fold: time-ordered events + carried-in state →
    * (closed sessions in order, final open state). One definition serves
    * the streaming micro-batch path and the batch backfill path, so their
    * session boundaries cannot drift.
    */
  private def foldSessions(userId: Long, sorted: Seq[Event],
      initial: Option[SessionState]): (List[SessionSummary], Option[SessionState]) = {
    // The gap compares SECOND-TRUNCATED instants, exactly like the batch
    // lag/cumsum form (`ts.cast("long")` diff > 1800) and the DuckDB
    // oracle's date_diff('second', ...) — a millisecond-precision gap
    // would split sessions the oracle keeps whenever a >30min gap has the
    // right sub-second fractions (events carry µs precision).
    def epochSec(t: Timestamp): Long = Math.floorDiv(t.getTime, 1000L)
    var closed = List.empty[SessionSummary]
    var cur = initial
    sorted.foreach { e =>
      cur match {
        case Some(s) if epochSec(e.ts) - epochSec(s.last) <= SessionGapSeconds =>
          cur = Some(s.copy(last = e.ts, nEvents = s.nEvents + 1))
        case Some(s) =>
          closed ::= SessionSummary(userId, s.sessionId, s.start, s.nEvents)
          cur = Some(SessionState(s.sessionId + 1, e.ts, e.ts, 1))
        case None =>
          cur = Some(SessionState(1, e.ts, e.ts, 1))
      }
    }
    (closed.reverse, cur)
  }

  /** Custom-state sessionization via flatMapGroupsWithState: per-user
    * sessions split on >30-minute gaps, closed sessions emitted when the
    * event-time watermark passes last-event + gap (EventTimeTimeout).
    *
    * STREAMING-ONLY: in batch execution EventTimeTimeout never fires, so
    * each user's final open session would be silently dropped — use
    * [[sessionizeBatch]] for backfill (same fold, open sessions flushed).
    *
    * Same session boundaries as the batch lag/cumsum form
    * (Analytics.sessionize); session_id is the 1-based per-user sequence, so
    * summaries are comparable across the implementations.
    */
  def sessionize(events: Dataset[Event], watermark: String = "1 hour"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, s.sessionId, s.start, s.nEvents))
          } else {
            // state updates must see events in time order; a micro-batch's
            // iterator is unordered
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val (closed, cur) = foldSessions(userId, sorted, state.getOption)
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + SessionGapSeconds * 1000L)
            }
            closed.iterator
          }
      }
  }

  /** Batch backfill form of [[sessionize]]: the SAME fold over each user's
    * full history, with the final open session flushed (there is no "later
    * data" in batch). Emits exactly what the streaming query would emit
    * once the watermark passed every session — this is the definition the
    * batch/streaming parity spec and the DuckDB oracle pin down.
    */
  def sessionizeBatch(events: Dataset[Event]): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (userId: Long, it: Iterator[Event]) =>
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val (closed, cur) = foldSessions(userId, sorted, None)
      (closed ++ cur.map(s => SessionSummary(userId, s.sessionId, s.start, s.nEvents))).iterator
    }
  }

  /** Stream-stream attribution join: every (purchase, click) pair of the
    * same user where the click happened in the `windowMinutes` before (or
    * at) the purchase — the streaming time-range join underneath any
    * attribution model (the as-of join's "latest click only" is its batch
    * refinement). Both sides carry watermarks, and the range condition
    * bounds each side's join state: a buffered click is dropped once the
    * purchase-side watermark passes click.ts + window, so state is
    * O(in-horizon events per user), independent of stream length.
    *
    * Works UNCHANGED on batch frames (watermarks are no-ops): the join is
    * an equi-join on user_id with the range as a join-level filter — per
    * user pairs only, never a cross join. That batch form is the
    * oracle-gated `events_attribution` query.
    */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 30, watermark: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (col("purchase_ts").cast("long") - col("click_ts").cast("long")).as("wait_sec"))
  }

  // ---- oracle-gated query forms (same output contract as Analytics) ----

  /** [[hourlyCounts]] over the events table — shares the eventsHourly
    * DuckDB oracle, putting the streaming window definition itself under
    * the value-level gate.
    */
  def hourlyCountsBatch(spark: SparkSession, sfDir: String): DataFrame =
    hourlyCounts(Tables.events(spark, sfDir)).orderBy("hour", "event_type")

  /** [[attributionJoin]] over the events table in batch form — the SAME
    * definition the streaming query runs, under its own DuckDB oracle.
    */
  def attributionBatch(spark: SparkSession, sfDir: String,
      windowMinutes: Int = 30): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    attributionJoin(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "click"),
        windowMinutes)
      .orderBy("purchase_id", "click_id")
  }

  /** Oracle for [[attributionBatch]] — same `windowMinutes` constant, and
    * every event-instant comparison runs on `::TIMESTAMP` (µs) values so
    * DuckDB sees exactly what Spark sees (Tables.events truncates the ns
    * parquet column to µs); wait_sec floors via integer `epoch_us // 1e6`,
    * never through a double epoch (whose ~0.5 µs resolution at 2024 epochs
    * could flip a second boundary).
    */
  def attributionBatchSql(windowMinutes: Int = 30): String =
    s"""SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
       |  epoch_us(p.ts::TIMESTAMP) // 1000000 - epoch_us(c.ts::TIMESTAMP) // 1000000 AS wait_sec
       |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       |JOIN (SELECT * FROM events WHERE event_type = 'click') c
       |  ON p.user_id = c.user_id
       | AND c.ts::TIMESTAMP <= p.ts::TIMESTAMP
       | AND c.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL $windowMinutes MINUTE
       |ORDER BY purchase_id, click_id""".stripMargin

  /** Declarative session windows via Spark's native `session_window` — the
    * third sessionization form next to the lag/cumsum window
    * (Analytics.sessionize) and the explicit mapGroupsWithState fold
    * ([[sessionize]]). In streaming this runs on the dedicated session-
    * window state store (merging windows as events arrive); in batch it is
    * a plain aggregate. Boundary rule (verified by spec, not assumed): an
    * event landing exactly `gap` after its predecessor MERGES — Spark
    * treats the window end as inclusive for merging, so the split
    * condition is `diff > gap`, identical to the lag/cumsum form; only the
    * output shape differs (session end = last event + gap).
    *
    * Scale: one shuffle on user_id; per-user window merging is linear in
    * the user's events. Session end = last event + gap is part of the
    * contract (it is what the streaming form emits at finalization).
    */
  def sessionWindows(spark: SparkSession, sfDir: String,
      gap: String = "30 minutes"): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  /** Oracle for [[sessionWindows]] — lag/cumsum with the session-window
    * boundary rule (split at diff > gap, exact-gap merges) and end = last
    * event + gap. Timestamps compare on `::TIMESTAMP` µs values; the
    * formatted output truncates to seconds, exactly like Spark's
    * date_format.
    */
  def sessionWindowsSql(gapSeconds: Int = 1800): String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
       |    CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
       |           OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER w)
       |              > ${gapSeconds}000000::BIGINT
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)),
       |sessions AS (
       |  SELECT user_id, ts,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                           ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM marked)
       |SELECT user_id,
       |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       |  strftime(max(ts) + INTERVAL $gapSeconds SECOND, '%Y-%m-%d %H:%M:%S') AS session_end,
       |  count(*) AS n_events
       |FROM sessions GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  /** Stream-static enrichment: join the event stream against a slowly-
    * changing dimension snapshot (customer keyed by user_id). In streaming
    * this is the stream-static join — stateless, no watermark required,
    * the static side is planned per micro-batch (a broadcast at this
    * dimension size; at 100 TB of dimension you bucket both sides
    * instead). Left join keeps events whose user has no dimension row —
    * dropping them silently is the classic enrichment bug.
    *
    * The aggregate-after-enrichment (events per nation per type) is the
    * batch form under the oracle; the streaming spec runs the SAME join on
    * a MemoryStream and checks micro-batch output equals the batch join.
    */
  def enrichJoin(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
      broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
      col("user_id") === col("c_custkey"), "left")

  def enrichedByNation(events: DataFrame, customer: DataFrame): DataFrame =
    enrichJoin(events, customer)
      .groupBy(coalesce(col("c_nationkey"), lit(-1L)).as("nationkey"),
        col("event_type"))
      // per-event values quantized to integer micro-units before the SUM —
      // a raw double sum is accumulation-order-dependent and Spark partial
      // aggregates don't fix an order, so the bit-exact oracle could flake
      // at larger group sizes; integer sums are order-free (the repo-wide
      // micro-unit discipline, cf. Search/QualityModel/HybridSearch)
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("value") * 1e6).cast("long")) / 1e6, 2).as("sum_value"))

  def enrichedByNationBatch(spark: SparkSession, sfDir: String): DataFrame =
    enrichedByNation(Tables.events(spark, sfDir), Tables.customer(spark, sfDir))
      .orderBy("nationkey", "event_type")

  def enrichedByNationSql: String =
    """SELECT coalesce(c.c_nationkey, -1) AS nationkey, e.event_type,
      |  count(*) AS n,
      |  round(sum(CAST(round(e.value * 1000000) AS BIGINT)) / 1000000.0, 2) AS sum_value
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, 2 ORDER BY nationkey, event_type""".stripMargin

  /** [[sessionizeBatch]] over the events table, shaped like
    * Analytics.sessionize — shares its DuckDB oracle, pinning the stateful
    * fold to the lag/cumsum window form.
    */
  def sessionizeBatchSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    sessionizeBatch(Tables.events(spark, sfDir).as[Event])
      .select(col("user_id"), col("session_id"), col("n_events"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy("user_id", "session_id")
  }
}

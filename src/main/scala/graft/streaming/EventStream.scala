package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` stream — the streaming
  * counterparts of [[graft.operators.Analytics.eventsHourly]] and
  * [[graft.operators.Analytics.sessionize]], plus watermarked exactly-once
  * event dedup. The reference is pure batch (SURVEY.md §1.4: no streaming
  * anywhere), so this module is extension surface: the same event-table
  * semantics, incrementally maintained.
  *
  * Every transform here takes a DataFrame/Dataset and works UNCHANGED on a
  * batch frame (watermarks are no-ops in batch) — the ScalaTest suite
  * exploits that to assert batch/streaming parity on identical input, and
  * it is the deployment story at scale: one query definition, backfill in
  * batch, tail in streaming.
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

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(sessionId: Long, start: Timestamp, last: Timestamp,
      nEvents: Long)

  case class SessionSummary(user_id: Long, session_id: Long,
      session_start: Timestamp, n_events: Long)

  val SessionGapSeconds: Long = 1800L

  /** Custom-state sessionization via flatMapGroupsWithState: per-user
    * sessions split on >30-minute gaps, closed sessions emitted when the
    * event-time watermark passes last-event + gap (EventTimeTimeout).
    *
    * Same session boundaries as the batch lag/cumsum form
    * (Analytics.sessionize); session_id is the 1-based per-user sequence, so
    * summaries are comparable across the two implementations.
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
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.last.getTime <= SessionGapSeconds * 1000L =>
                  cur = Some(s.copy(last = e.ts, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= SessionSummary(userId, s.sessionId, s.start, s.nEvents)
                  cur = Some(SessionState(s.sessionId + 1, e.ts, e.ts, 1))
                case None =>
                  cur = Some(SessionState(1, e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + SessionGapSeconds * 1000L)
            }
            closed.reverseIterator
          }
      }
  }
}

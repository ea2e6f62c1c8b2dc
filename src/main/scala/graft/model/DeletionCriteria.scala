package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The "query" object of the engine: an optional free-text SQL predicate plus
  * an optional half-open `[startTime, endTime)` window over a timestamp
  * column (reference: config/DeletionCriteria.java:14-17).
  *
  * Spark-first re-expression: instead of concatenating SQL text
  * (DeletionCriteria.java:51-75) we compose Catalyst [[Column]] predicates —
  * `expr(whereClause)` parses the user's clause with Spark's *expression*
  * parser, which rejects full statements outright, making the reference's
  * substring blocklist (DeletionCriteria.java:117-131) a defense-in-depth
  * extra rather than the only line of defense. We keep the blocklist for CLI
  * parity (SURVEY.md §2.2 P4).
  *
  * Window semantics: start inclusive, end EXCLUSIVE — the golden semantic
  * the reference's `testDeleteWithTimeWindow` pins down (SURVEY.md §5).
  */
final case class DeletionCriteria(
    whereClause: Option[String] = None,
    startTime: Option[Timestamp] = None,
    endTime: Option[Timestamp] = None,
    timeColumn: String = DeletionCriteria.DefaultTimeColumn) {

  /** The complete deletion predicate as a composed Column:
    * `timeCol >= start AND timeCol < end AND (userWhere)`
    * (reference: getCompleteWhereClause, DeletionCriteria.java:51-75).
    * None when the criteria is empty.
    */
  def deletePredicate: Option[Column] = {
    val parts = Seq(
      startTime.map(s => col(timeColumn) >= lit(s)),
      endTime.map(e => col(timeColumn) < lit(e)),
      whereClause.filter(_.trim.nonEmpty).map(w => expr(w))
    ).flatten
    parts.reduceOption(_ && _)
  }

  /** The inverse predicate — "delete = keep the complement"
    * (reference: getRetentionWhereClause, DeletionCriteria.java:82-88).
    * NOTE deliberate semantic choice, documented per SURVEY.md §7.4: SQL
    * `NOT (pred)` drops rows where pred is NULL. The reference inherits
    * that three-valued-logic hole; at 100 TB silently deleting NULL-predicate
    * rows is a data-loss bug, so we retain rows where the delete predicate
    * is not TRUE: `NOT coalesce(pred, false)`.
    */
  def retainPredicate: Option[Column] =
    deletePredicate.map(p => !coalesce(p, lit(false)))

  /** SQL text form of the delete predicate, for DDL/audit/metastore surfaces
    * that need a string (and for the DuckDB oracle). Matches the reference's
    * text layout (DeletionCriteria.java:51-75).
    */
  def completeWhereClauseSql: Option[String] = {
    val parts = Seq(
      startTime.map(s => s"$timeColumn >= '$s'"),
      endTime.map(e => s"$timeColumn < '$e'"),
      whereClause.filter(_.trim.nonEmpty).map(w => s"($w)")
    ).flatten
    if (parts.isEmpty) None else Some(parts.mkString(" AND "))
  }

  def retentionWhereClauseSql: Option[String] =
    completeWhereClauseSql.map(c => s"NOT coalesce(($c), false)")

  def isEmpty: Boolean =
    startTime.isEmpty && endTime.isEmpty && whereClause.forall(_.trim.isEmpty)

  /** Reference: validate(), DeletionCriteria.java:95-112. */
  def validate(): Unit = {
    require(!isEmpty, "Deletion criteria must have at least one condition")
    for (s <- startTime; e <- endTime)
      require(!s.after(e), "Start time must be before end time")
    require(timeColumn.trim.nonEmpty, "Time column cannot be empty")
    whereClause.foreach { w =>
      require(!DeletionCriteria.containsSuspiciousPatterns(w),
        "WHERE clause contains potentially unsafe patterns")
    }
  }
}

object DeletionCriteria {
  val DefaultTimeColumn = "row_create_ts"

  /** Substring blocklist kept for parity (reference:
    * DeletionCriteria.java:117-131); real enforcement is `expr()` parsing.
    */
  private val SuspiciousPatterns = Seq(
    ";", "--", "/*", "*/", "xp_", "sp_", "exec ", "execute ",
    "drop ", "truncate ", "alter ", "create ", "insert ")

  def containsSuspiciousPatterns(clause: String): Boolean = {
    val lower = clause.toLowerCase
    SuspiciousPatterns.exists(lower.contains)
  }

  /** Parse a 'yyyy-MM-dd HH:mm:ss' wall-clock string as a UTC instant —
    * the engine's one time convention (session timeZone is pinned UTC in
    * GraftSession, and the partition-ID date convention is the UTC date).
    * `Timestamp.valueOf` would parse in the driver JVM's default zone,
    * silently shifting which partitions the date prune keeps relative to
    * the instant predicate on any non-UTC host.
    */
  def parseUtc(t: String): Timestamp = Timestamp.from(
    java.time.LocalDateTime.parse(t.trim.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC))

  def builder(): Builder = new Builder

  /** Builder kept for API parity with the reference's Java surface. */
  final class Builder {
    private var whereClause: Option[String] = None
    private var startTime: Option[Timestamp] = None
    private var endTime: Option[Timestamp] = None
    private var timeColumn: String = DefaultTimeColumn

    def whereClause(w: String): Builder = { whereClause = Option(w); this }
    def startTime(t: Timestamp): Builder = { startTime = Option(t); this }
    def startTime(t: String): Builder = { startTime = Some(parseUtc(t)); this }
    def endTime(t: Timestamp): Builder = { endTime = Option(t); this }
    def endTime(t: String): Builder = { endTime = Some(parseUtc(t)); this }
    def timeColumn(c: String): Builder = { timeColumn = c; this }
    def build(): DeletionCriteria = {
      val c = DeletionCriteria(whereClause, startTime, endTime, timeColumn)
      c.validate()
      c
    }
  }
}

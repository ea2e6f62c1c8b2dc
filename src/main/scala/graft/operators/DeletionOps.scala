package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.DeletionCriteria
import graft.sources.Tables

/** The deletion engine's relational semantics expressed as pure queries on
  * the `events` table, so the DuckDB oracle can hash-check them
  * (SURVEY.md §2.2 P1/P2/P5, §2.7 C1/C5). The mutating workflow versions
  * live in [[graft.core.DeletionExecutor]]; these are the same predicates
  * with a SELECT surface.
  *
  * Fixed demonstration criteria: delete `event_type='click' AND value < 50`
  * within `[2024-01-10 00:00:00, 2024-01-20 00:00:00)` over `ts` — start
  * inclusive, end EXCLUSIVE (the golden semantic, FIXTURES.md §1).
  */
object DeletionOps {
  // parseUtc, not Timestamp.valueOf: valueOf reads the wall-clock string in
  // the driver's default TZ, so on a non-UTC driver the constants would
  // drift from the oracle's naive TIMESTAMP literals (the session TZ is
  // pinned to UTC — GraftSession). defs, not vals, so a TZ-shifted spec
  // exercises the parse regardless of object-initialization order.
  private def start = DeletionCriteria.parseUtc("2024-01-10 00:00:00")
  private def end = DeletionCriteria.parseUtc("2024-01-20 00:00:00")

  def criteria: DeletionCriteria = DeletionCriteria(
    whereClause = Some("event_type = 'click' AND value < 50"),
    startTime = Some(start),
    endTime = Some(end),
    timeColumn = "ts")

  private val whereSql =
    "ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00' " +
      "AND (event_type = 'click' AND value < 50)"

  /** ts rendered to second precision — the raw column is ns in parquet and
    * µs in Spark, so emitting it directly would hash-mismatch the oracle.
    */
  private def projected(df: DataFrame): DataFrame =
    df.select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
      col("user_id"), col("event_type"), col("value"), col("props"))

  /** P2/C4 complement scan: the rows a deletion would RETAIN (null-safe
    * negation — rows where the predicate is not TRUE survive).
    */
  def retainComplement(spark: SparkSession, sfDir: String): DataFrame = {
    val retain = criteria.retainPredicate.get
    projected(Tables.events(spark, sfDir).where(retain)).orderBy("event_id")
  }

  val retainComplementSql: String =
    s"""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       |       user_id, event_type, value, props
       |FROM events WHERE NOT coalesce(($whereSql), false) ORDER BY event_id""".stripMargin

  /** C5 dry run: would-delete / would-retain counts in ONE pass
    * (the reference runs two COUNT queries — DeletionExecutor.java:84-96).
    */
  def dryRunCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val del = criteria.deletePredicate.get
    Tables.events(spark, sfDir).agg(
      count(when(del, 1)).as("to_delete"),
      count(when(!coalesce(del, lit(false)), 1)).as("to_retain"))
  }

  val dryRunCountsSql: String =
    s"""SELECT count(*) FILTER (WHERE $whereSql) AS to_delete,
       |       count(*) FILTER (WHERE NOT coalesce(($whereSql), false)) AS to_retain
       |FROM events""".stripMargin

  /** C1 as one grouped probe: partitions (derived `yyyyMMdd` of ts —
    * the conventional partition-ID encoding, SURVEY.md §1.2) holding at
    * least one matching record, with their match counts. At scale this is
    * the single-scan replacement for the reference's N serial COUNT jobs.
    */
  def affectedPartitions(spark: SparkSession, sfDir: String): DataFrame = {
    val del = criteria.deletePredicate.get
    Tables.events(spark, sfDir)
      .withColumn("partition_id", date_format(col("ts"), "yyyyMMdd"))
      .where(del)
      .groupBy("partition_id")
      .agg(count(lit(1)).as("match_cnt"))
      .orderBy("partition_id")
  }

  val affectedPartitionsSql: String =
    s"""SELECT strftime(ts, '%Y%m%d') AS partition_id, count(*) AS match_cnt
       |FROM events WHERE $whereSql
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** P5 partition IN-list scan: complement restricted to an explicit
    * partition set (`pc IN (...)` — what the kernel issues per batch).
    */
  def partitionFilterScan(spark: SparkSession, sfDir: String): DataFrame = {
    val pids = Seq("20240112", "20240115")
    val retain = criteria.retainPredicate.get
    projected(
      Tables.events(spark, sfDir)
        .withColumn("partition_id", date_format(col("ts"), "yyyyMMdd"))
        .where(col("partition_id").isin(pids: _*))
        .where(retain)
        .drop("partition_id"))
      .orderBy("event_id")
  }

  val partitionFilterScanSql: String =
    s"""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       |       user_id, event_type, value, props
       |FROM events
       |WHERE strftime(ts, '%Y%m%d') IN ('20240112', '20240115')
       |  AND NOT coalesce(($whereSql), false)
       |ORDER BY event_id""".stripMargin

  /** P1 time-window end-exclusivity probe: per-type counts inside the
    * half-open window only.
    */
  def timeWindowCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .where(col("ts") >= lit(start) && col("ts") < lit(end))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  val timeWindowCountsSql: String =
    """SELECT event_type, count(*) AS n FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** §1.2 partition-ID algebra as a DISTRIBUTED parse (regexp per scheme),
    * complementing the driver-side [[graft.partition.PartitionId]]: derive
    * IDs in all three naming schemes from event dates, parse back base
    * date + scheme + reload sequence.
    */
  def partitionParse(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = when(col("event_id") % 3 === 0, date_format(col("ts"), "yyyyMMdd"))
      .when(col("event_id") % 3 === 1,
        concat(date_format(col("ts"), "yyyyMMdd"), lit("-"), (col("event_id") % 5 + 1).cast("string")))
      .otherwise(concat(lit("history_"), date_format(col("ts"), "yyyyMMdd"),
        when(col("event_id") % 2 === 0, concat(lit("-"), (col("event_id") % 7 + 1).cast("string")))
          .otherwise(lit(""))))
    Tables.events(spark, sfDir)
      .select(col("event_id"), raw.as("raw"))
      .withColumn("base_date",
        when(col("raw").rlike("^\\d{8}$"), regexp_extract(col("raw"), "^(\\d{8})$", 1))
          .when(col("raw").rlike("^\\d{8}-\\d+$"), regexp_extract(col("raw"), "^(\\d{8})-\\d+$", 1))
          .when(col("raw").rlike("^history_\\d{8}(-\\d+)?$"),
            regexp_extract(col("raw"), "^history_(\\d{8})", 1))
          .otherwise(lit(null)))
      .withColumn("scheme",
        when(col("raw").rlike("^\\d{8}$"), lit("CURRENT"))
          .when(col("raw").rlike("^\\d{8}-\\d+$"), lit("PREVIOUS"))
          .when(col("raw").rlike("^history_\\d{8}(-\\d+)?$"), lit("HISTORY"))
          .otherwise(lit("UNKNOWN")))
      .withColumn("seq",
        when(col("raw").rlike("-(\\d+)$"), regexp_extract(col("raw"), "-(\\d+)$", 1).cast("int"))
          .otherwise(lit(null)))
      .orderBy("event_id")
  }

  val partitionParseSql: String =
    """WITH raws AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y%m%d')
      |         WHEN event_id % 3 = 1 THEN strftime(ts, '%Y%m%d') || '-' || CAST(event_id % 5 + 1 AS VARCHAR)
      |         ELSE 'history_' || strftime(ts, '%Y%m%d') ||
      |              CASE WHEN event_id % 2 = 0 THEN '-' || CAST(event_id % 7 + 1 AS VARCHAR) ELSE '' END
      |    END AS raw
      |  FROM events)
      |SELECT event_id, raw,
      |  CASE WHEN regexp_matches(raw, '^\d{8}$') THEN regexp_extract(raw, '^(\d{8})$', 1)
      |       WHEN regexp_matches(raw, '^\d{8}-\d+$') THEN regexp_extract(raw, '^(\d{8})-\d+$', 1)
      |       WHEN regexp_matches(raw, '^history_\d{8}(-\d+)?$') THEN regexp_extract(raw, '^history_(\d{8})', 1)
      |       ELSE NULL END AS base_date,
      |  CASE WHEN regexp_matches(raw, '^\d{8}$') THEN 'CURRENT'
      |       WHEN regexp_matches(raw, '^\d{8}-\d+$') THEN 'PREVIOUS'
      |       WHEN regexp_matches(raw, '^history_\d{8}(-\d+)?$') THEN 'HISTORY'
      |       ELSE 'UNKNOWN' END AS scheme,
      |  CASE WHEN regexp_matches(raw, '-(\d+)$') THEN CAST(regexp_extract(raw, '-(\d+)$', 1) AS INT)
      |       ELSE NULL END AS seq
      |FROM raws ORDER BY event_id""".stripMargin
}

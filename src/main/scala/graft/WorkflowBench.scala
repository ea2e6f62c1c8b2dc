package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.core.{DeletionWorkflow, GraftSession}
import graft.model.{DeletionCriteria, JobConfig, Metrics}
import graft.sources.Tables

/** End-to-end benchmark of the 7-step deletion WORKFLOW (the actual
  * product), complementing graft.Bench's query-surface timing — fills
  * BASELINE.md's "end-to-end deletion workflow wall time" protocol row.
  *
  * Builds a partitioned ORC Hive table from the sf-dir events (one
  * partition per day, partition_id = yyyyMMdd, the reference's CURRENT
  * naming scheme), then runs DeletionWorkflow.run with a time-window
  * criteria chosen to exercise BOTH kernel paths: the window's first day is
  * partially rewritten, the fully-covered days take the drop+delete fast
  * path. Prints one JSON line with total and per-phase wall times.
  */
object WorkflowBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val json = run(sfDir, cpus)
    println(json)
    val jsonVersioned = runVersioned(sfDir, cpus)
    println(jsonVersioned)
    val jsonMcOrc = runVersionedMultiColOrc(sfDir, cpus)
    println(jsonMcOrc)
    if (Seq(json, jsonVersioned, jsonMcOrc)
        .exists(_.contains(""""ok":false"""))) sys.exit(1)
  }

  /** The measured workflow as one JSON object string — callable from
    * [[Bench]] so BENCH_r{N}.json carries the workflow block next to the
    * query surface and workflow regressions trip the same protocol.
    * Builds (and stops) its own Hive-enabled session; exits the JVM only
    * from [[main]].
    */
  def run(sfDir: String, cpus: String): String = {
    val warehouse = Files.createTempDirectory("graft-wfbench-wh").toString
    val metastore = Files.createTempDirectory("graft-wfbench-ms").toString
    val spark = GraftSession.builder(
        appName = "graft-workflow-bench",
        master = Some(s"local[$cpus]"),
        hiveSupport = true,
        shufflePartitions = Some(cpus.toInt),
        extraConfs = Map(
          "spark.sql.warehouse.dir" -> warehouse,
          "spark.ui.enabled" -> "false"))
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastore/metastore_db;create=true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val db = "wf_bench_db"
    val table = s"$db.events_deletion"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $table")

    // one daily partition per event day (drop the nested props column —
    // the deletion kernel is schema-generic, but ORC fixtures stay simple)
    val tSetup0 = System.nanoTime()
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), date_format(col("ts"), "yyyyMMdd").as("partition_id"))
      .write.mode(SaveMode.Overwrite).format("orc")
      .partitionBy("partition_id").saveAsTable(table)
    val nPartitions = spark.sql(s"SHOW PARTITIONS $table").count()
    val rowsBefore = spark.table(table).count()
    val setupSec = (System.nanoTime() - tSetup0) / 1e9

    // window [05 12:00, 08 00:00) UTC: day 05 rewritten, days 06-07
    // dropped. Constructed from explicit-UTC instants — Timestamp.valueOf
    // would parse in the host's default zone and shift which kernel paths
    // the benchmark exercises on non-UTC machines.
    def utcTs(s: String): Timestamp = Timestamp.from(
      java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC))
    val criteria = DeletionCriteria(
      startTime = Some(utcTs("2024-01-05T12:00:00")),
      endTime = Some(utcTs("2024-01-08T00:00:00")),
      timeColumn = "ts")
    val config = JobConfig(db, "events_deletion", criteria,
      backupStrategy = "hive_table", validationSampleSize = 10000)

    val metrics = new Metrics
    val t0 = System.nanoTime()
    val ok = DeletionWorkflow.run(spark, config, metrics)
    val totalSec = (System.nanoTime() - t0) / 1e9
    metrics.markJobEnd()

    val rowsAfter = spark.table(table).count()
    val phases = metrics.phaseTimings
      .map { case (k, ms) => s""""$k":${ms / 1000.0}""" }.mkString("{", ",", "}")
    val json = s"""{"metric":"workflow_total","value":$totalSec,"unit":"sec",""" +
      s""""ok":$ok,"phases":$phases,"setup_sec":$setupSec,""" +
      s""""partitions":$nPartitions,"rows_before":$rowsBefore,"rows_after":$rowsAfter,""" +
      s""""records_deleted":${metrics.totalRecordsDeleted},"sf":"$sfDir"}"""
    spark.stop()
    json
  }

  /** The SAME 7-step deletion (same events fixture, same time window,
    * same two kernel paths: one partition rewritten, two dropped) against
    * the VERSIONED backend ([[graft.core.VersionedDeletionWorkflow]]) —
    * measured side by side so the cost-model claim ("the prior version IS
    * the backup; restore is a pointer flip") is a committed NUMBER, not
    * prose: the Hive block above pays a full `saveAsTable` copy in its
    * backup phase, this one's backup phase is one metadata read.
    */
  def runVersioned(sfDir: String, cpus: String): String = {
    val spark = GraftSession.builder(
        appName = "graft-wfbench-versioned",
        master = Some(s"local[$cpus]"),
        hiveSupport = false,
        shufflePartitions = Some(cpus.toInt),
        extraConfs = Map("spark.ui.enabled" -> "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-wfbench-vt").toString

    val tSetup0 = System.nanoTime()
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), date_format(col("ts"), "yyyyMMdd").as("partition_id"))
    graft.sources.VersionedTable.create(events, dir, "partition_id")
    val rowsBefore = graft.sources.VersionedTable.readLatest(spark, dir).count()
    val setupSec = (System.nanoTime() - tSetup0) / 1e9

    def utcTs(s: String): Timestamp = Timestamp.from(
      java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC))
    val pred = col("ts") >= lit(utcTs("2024-01-05T12:00:00")) &&
      col("ts") < lit(utcTs("2024-01-08T00:00:00"))

    val metrics = new Metrics
    val t0 = System.nanoTime()
    val ok = graft.core.VersionedDeletionWorkflow.run(
      spark, dir, "partition_id", pred, metrics)
    val totalSec = (System.nanoTime() - t0) / 1e9
    metrics.markJobEnd()

    val rowsAfter = graft.sources.VersionedTable.readLatest(spark, dir).count()
    val phases = metrics.phaseTimings
      .map { case (k, ms) => s""""$k":${ms / 1000.0}""" }.mkString("{", ",", "}")
    val json = s"""{"metric":"workflow_versioned_total","value":$totalSec,""" +
      s""""unit":"sec","ok":$ok,"phases":$phases,"setup_sec":$setupSec,""" +
      s""""rows_before":$rowsBefore,"rows_after":$rowsAfter,""" +
      s""""records_deleted":${metrics.totalRecordsDeleted},"sf":"$sfDir"}"""
    spark.stop()
    json
  }

  /** The SAME 7-step deletion once more, against the round-10 layouts
    * BOTH at once: a MULTI-COLUMN spec (event_type, partition_id) on an
    * ORC-format versioned table — the reference-shaped path (the
    * reference engine is ORC-native and its tables nest type under day
    * in practice) measured on exactly the machinery those features
    * added, so a layout-specific regression (tuple grouping, ORC stats
    * harvest, ORC COW rewrite) trips the same per-round protocol as the
    * parquet single-column block above.
    */
  def runVersionedMultiColOrc(sfDir: String, cpus: String): String = {
    val spark = GraftSession.builder(
        appName = "graft-wfbench-mcorc",
        master = Some(s"local[$cpus]"),
        hiveSupport = false,
        shufflePartitions = Some(cpus.toInt),
        extraConfs = Map("spark.ui.enabled" -> "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-wfbench-mcorc").toString

    val tSetup0 = System.nanoTime()
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), date_format(col("ts"), "yyyyMMdd").as("partition_id"))
    graft.sources.VersionedTable.create(events, dir,
      "event_type,partition_id", format = "orc")
    val rowsBefore = graft.sources.VersionedTable.readLatest(spark, dir).count()
    val setupSec = (System.nanoTime() - tSetup0) / 1e9

    def utcTs(s: String): Timestamp = Timestamp.from(
      java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC))
    val pred = col("ts") >= lit(utcTs("2024-01-05T12:00:00")) &&
      col("ts") < lit(utcTs("2024-01-08T00:00:00"))

    val metrics = new Metrics
    val t0 = System.nanoTime()
    val ok = graft.core.VersionedDeletionWorkflow.run(
      spark, dir, "event_type,partition_id", pred, metrics)
    val totalSec = (System.nanoTime() - t0) / 1e9
    metrics.markJobEnd()

    val rowsAfter = graft.sources.VersionedTable.readLatest(spark, dir).count()
    val allOrc = graft.sources.VersionedTable.liveDataFiles(spark, dir)
      .forall(_.endsWith(".orc"))
    val phases = metrics.phaseTimings
      .map { case (k, ms) => s""""$k":${ms / 1000.0}""" }.mkString("{", ",", "}")
    val json = s"""{"metric":"workflow_versioned_multicol_orc_total",""" +
      s""""value":$totalSec,"unit":"sec","ok":${ok && allOrc},""" +
      s""""phases":$phases,"setup_sec":$setupSec,""" +
      s""""rows_before":$rowsBefore,"rows_after":$rowsAfter,""" +
      s""""records_deleted":${metrics.totalRecordsDeleted},"sf":"$sfDir"}"""
    spark.stop()
    json
  }
}

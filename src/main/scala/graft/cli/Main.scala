package graft.cli

import java.io.FileInputStream
import java.util.Properties

import org.slf4j.LoggerFactory

import graft.core.{DeletionWorkflow, GraftSession, VersionedDeletionWorkflow}
import graft.catalog.CatalogOps
import graft.model.{DeletionCriteria, JobConfig, Metrics}

/** CLI entry point — same 11-option surface as the reference
  * (HiveTableDeletionJob.parseArguments, HiveTableDeletionJob.java:165-261):
  * `-d/--database -t/--table -w/--where -s/--start-time -e/--end-time
  *  -tc/--time-column -pc/--partition-column -bs/--backup-strategy
  *  -bl/--backup-location -dr/--dry-run -c/--config -h/--help`.
  * Hand-rolled parsing (no commons-cli; offline-resolvable stack,
  * SURVEY.md §7).
  *
  * EXTENSION beyond the reference surface: `-b/--backend versioned`
  * runs the same 7-step DAG against a path-addressed
  * [[graft.sources.VersionedTable]] (`-td/--table-dir`) instead of the
  * Hive catalog — backup becomes a version pointer (zero copy), restore
  * a manifest flip, cleanup a vacuum
  * ([[graft.core.VersionedDeletionWorkflow]]).
  */
object Main {
  private val logger = LoggerFactory.getLogger(getClass)
  private val audit = LoggerFactory.getLogger("AUDIT")

  private val Help =
    """usage: graft.cli.Main [options]
      | -d,--database <arg>          Database name (required)
      | -t,--table <arg>             Table name (required)
      | -w,--where <arg>             WHERE clause for deletion criteria
      | -s,--start-time <arg>        Start time (yyyy-MM-dd HH:mm:ss), inclusive
      | -e,--end-time <arg>          End time (yyyy-MM-dd HH:mm:ss), exclusive
      | -tc,--time-column <arg>      Time column name (default: row_create_ts)
      | -pc,--partition-column <arg> Partition column name (default: partition_id)
      | -bs,--backup-strategy <arg>  Backup strategy: hive_table | hdfs | path
      | -bl,--backup-location <arg>  Backup location (for path strategy)
      | -dr,--dry-run                Dry run mode (no actual deletion)
      | -c,--config <arg>            Path to configuration properties file
      | -b,--backend <arg>           Backend: hive (default) | versioned
      | -td,--table-dir <arg>        Versioned table path (versioned backend)
      | -h,--help                    Print help message
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    val metrics = new Metrics
    try {
      val opts = parseArguments(args)
      if (opts.contains("help")) { println(Help); sys.exit(0) }
      if (opts.getOrElse("backend", "hive") == "versioned") {
        sys.exit(if (runVersioned(opts, metrics)) 0 else 1)
      }
      val props = loadProperties(opts)
      val config = loadConfiguration(opts, props)

      logger.info(s"Starting deletion job. Configuration: $config")
      audit.info(s"JOB_START - Table: ${config.fullTableName}, Criteria: ${config.deletionCriteria}")

      // spark.* keys from the properties overlay reach the session builder
      // (reference: SparkSessionManager.java:42-50)
      import scala.jdk.CollectionConverters._
      val sparkConfs = props.stringPropertyNames.asScala
        .map(k => k -> props.getProperty(k)).toMap
      val spark = GraftSession.create(s"${config.fullTableName}_deletion",
        extraConfs = sparkConfs)
      // exit AFTER the finally: sys.exit inside the try would skip
      // spark.stop() (System.exit does not unwind the stack), leaving
      // shutdown to hooks and risking buffered audit lines
      val success =
        try {
          new CatalogOps(spark).validateCatalog()
          val ok = DeletionWorkflow.run(spark, config, metrics)
          metrics.markJobEnd()
          logger.info(metrics.report)
          if (ok) audit.info("JOB_SUCCESS") else audit.error("JOB_FAILED")
          ok
        } finally spark.stop()
      sys.exit(if (success) 0 else 1)
    } catch {
      case e: Exception =>
        logger.error(s"Job failed with exception: ${e.getMessage}", e)
        audit.error(s"JOB_EXCEPTION - Error: ${e.getMessage}")
        metrics.markJobEnd()
        sys.exit(1)
    }
  }

  /** The versioned-backend job: same criteria compiler, same audit
    * channel and metrics report, the 7-step DAG from
    * [[VersionedDeletionWorkflow]] (backup = version pointer, restore =
    * manifest flip).
    */
  private def runVersioned(opts: Map[String, String], metrics: Metrics): Boolean = {
    val criteriaBuilder = DeletionCriteria.builder()
    opts.get("where").foreach(criteriaBuilder.whereClause)
    opts.get("start-time").foreach(criteriaBuilder.startTime)
    opts.get("end-time").foreach(criteriaBuilder.endTime)
    opts.get("time-column").foreach(criteriaBuilder.timeColumn)
    val criteria = criteriaBuilder.build()
    criteria.validate()
    val pred = criteria.deletePredicate.getOrElse(
      throw new IllegalArgumentException(
        "versioned backend needs a non-empty deletion criteria"))
    val tableDir = opts("table-dir")
    val partCol = opts.getOrElse("partition-column", "partition_id")
    audit.info(s"JOB_START - Table: $tableDir (versioned), Criteria: $criteria")
    val spark = GraftSession.create("versioned_deletion")
    val ok =
      try VersionedDeletionWorkflow.run(spark, tableDir, partCol, pred,
        metrics, dryRun = opts.contains("dry-run"))
      finally spark.stop()
    metrics.markJobEnd()
    logger.info(metrics.report)
    if (ok) audit.info("JOB_SUCCESS") else audit.error("JOB_FAILED")
    ok
  }

  /** Parse `-x value` / `--long value` / boolean flags into a key→value map
    * keyed by long option name.
    */
  private[cli] def parseArguments(args: Array[String]): Map[String, String] = {
    val aliases = Map(
      "-d" -> "database", "--database" -> "database",
      "-t" -> "table", "--table" -> "table",
      "-w" -> "where", "--where" -> "where",
      "-s" -> "start-time", "--start-time" -> "start-time",
      "-e" -> "end-time", "--end-time" -> "end-time",
      "-tc" -> "time-column", "--time-column" -> "time-column",
      "-pc" -> "partition-column", "--partition-column" -> "partition-column",
      "-bs" -> "backup-strategy", "--backup-strategy" -> "backup-strategy",
      "-bl" -> "backup-location", "--backup-location" -> "backup-location",
      "-dr" -> "dry-run", "--dry-run" -> "dry-run",
      "-c" -> "config", "--config" -> "config",
      "-b" -> "backend", "--backend" -> "backend",
      "-td" -> "table-dir", "--table-dir" -> "table-dir",
      "-h" -> "help", "--help" -> "help")
    val flags = Set("dry-run", "help")

    var opts = Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val key = aliases.getOrElse(args(i), {
        System.err.println(Help)
        throw new IllegalArgumentException(s"Unknown option: ${args(i)}")
      })
      if (flags(key)) { opts += key -> "true"; i += 1 }
      else {
        if (i + 1 >= args.length) {
          System.err.println(Help)
          throw new IllegalArgumentException(s"Missing value for option: ${args(i)}")
        }
        opts += key -> args(i + 1); i += 2
      }
    }
    if (!opts.contains("help")) {
      val backend = opts.getOrElse("backend", "hive")
      if (backend != "hive" && backend != "versioned") {
        System.err.println(Help)
        throw new IllegalArgumentException(s"Unknown backend: $backend")
      }
      // the versioned backend is path-addressed: --table-dir replaces
      // --database/--table; the hive backend keeps the reference contract
      val required =
        if (backend == "versioned") Seq("table-dir") else Seq("database", "table")
      required.foreach { r =>
        if (!opts.contains(r)) {
          System.err.println(Help)
          throw new IllegalArgumentException(s"Missing required option: --$r")
        }
      }
    }
    opts
  }

  /** classpath application.properties overlaid with the optional --config
    * file (reference: loadConfiguration, HiveTableDeletionJob.java:266-328).
    */
  private[cli] def loadProperties(opts: Map[String, String]): Properties = {
    val props = new Properties()
    val cl = getClass.getClassLoader
    Option(cl.getResourceAsStream("application.properties")).foreach { in =>
      try props.load(in) finally in.close()
    }
    opts.get("config").foreach { path =>
      val in = new FileInputStream(path)
      try props.load(in) finally in.close()
    }
    props
  }

  /** properties → CLI overrides → validated JobConfig. */
  private[cli] def loadConfiguration(opts: Map[String, String],
      props: Properties): JobConfig = {
    val criteriaBuilder = DeletionCriteria.builder()
    opts.get("where").foreach(criteriaBuilder.whereClause)
    opts.get("start-time").foreach(criteriaBuilder.startTime)
    opts.get("end-time").foreach(criteriaBuilder.endTime)
    opts.get("time-column").foreach(criteriaBuilder.timeColumn)
    val criteria = criteriaBuilder.build()

    var config = JobConfig(
      database = opts("database"),
      tableName = opts("table"),
      deletionCriteria = criteria
    ).withProperties(props)

    opts.get("partition-column").foreach(v => config = config.copy(partitionColumn = v))
    opts.get("backup-strategy").foreach(v => config = config.copy(backupStrategy = v))
    opts.get("backup-location").foreach(v => config = config.copy(backupLocation = Some(v)))
    if (opts.contains("dry-run")) config = config.copy(dryRun = true)

    config.validate()
    config
  }
}

package graft.cli

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.LoggerContext
import org.scalatest.funsuite.AnyFunSuite

/** Config-loading and logging-wiring parity: the classpath
  * application.properties must provide the reference defaults
  * (HiveTableDeletionJob.java:266-328), and the AUDIT channel must have its
  * own non-additive appender (reference log4j.properties:18-28).
  */
class MainSpec extends AnyFunSuite {

  private val required = Map("database" -> "db1", "table" -> "t1",
    "where" -> "status = 'INACTIVE'")

  test("classpath application.properties supplies reference defaults") {
    val props = Main.loadProperties(required)
    val cfg = Main.loadConfiguration(required, props)
    assert(cfg.backupStrategy == "hive_table")
    assert(cfg.backupRetentionDays == 7)
    assert(cfg.validationEnabled)
    assert(cfg.validationSampleSize == 10000)
    assert(cfg.validationTolerancePercent == 0.0)
    assert(cfg.autoRecoveryEnabled)
    assert(cfg.maxRecoveryRetries == 3)
    assert(cfg.partitionParallelism == 10)
    assert(cfg.batchSize == 1000000L)
    assert(!cfg.dryRun)
  }

  test("classpath properties carry the session spark.* confs") {
    val props = Main.loadProperties(required)
    assert(props.getProperty("spark.sql.sources.partitionOverwriteMode") == "dynamic")
    assert(props.getProperty("spark.sql.adaptive.enabled") == "true")
  }

  test("CLI options override properties") {
    val opts = required ++ Map("backup-strategy" -> "path",
      "backup-location" -> "/tmp/bk", "dry-run" -> "true")
    val cfg = Main.loadConfiguration(opts, Main.loadProperties(opts))
    assert(cfg.backupStrategy == "path")
    assert(cfg.backupLocation.contains("/tmp/bk"))
    assert(cfg.dryRun)
  }

  test("AUDIT logger has a dedicated non-additive rolling appender") {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val lc = ctx.getConfiguration.getLoggerConfig("AUDIT")
    assert(lc.getName == "AUDIT", "AUDIT logger must be configured explicitly")
    assert(!lc.isAdditive, "audit events must not blend into root logging")
    assert(lc.getAppenders.containsKey("auditFile"))
  }

  test("unknown option and missing required option are rejected") {
    intercept[IllegalArgumentException](Main.parseArguments(Array("--bogus", "x")))
    intercept[IllegalArgumentException](Main.parseArguments(Array("-d", "db_only")))
  }

  test("versioned backend: parse accepts --table-dir, rejects bad/missing") {
    val opts = Main.parseArguments(Array(
      "-b", "versioned", "-td", "/tmp/t", "-w", "id = 5"))
    assert(opts("backend") === "versioned")
    assert(opts("table-dir") === "/tmp/t")
    // versioned is path-addressed: database/table not required
    assert(!opts.contains("database"))
    intercept[IllegalArgumentException] {
      Main.parseArguments(Array("-b", "versioned", "-w", "id = 5"))
    }
    intercept[IllegalArgumentException] {
      Main.parseArguments(Array("-b", "nosuch", "-d", "db", "-t", "t"))
    }
  }
}

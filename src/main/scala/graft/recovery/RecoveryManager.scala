package graft.recovery

import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

import graft.backup.BackupManager
import graft.catalog.CatalogOps
import graft.model.JobConfig

/** Restore-with-retry on workflow failure (reference:
  * recovery/RecoveryManager.java; SURVEY.md §2.7 C8): up to
  * `maxRecoveryRetries` restore attempts with exponential backoff
  * `2^attempt` seconds; if all fail, emit a manual-recovery SQL runbook.
  */
final class RecoveryManager(spark: SparkSession, config: JobConfig, backupManager: BackupManager) {
  private val logger = LoggerFactory.getLogger(classOf[RecoveryManager])
  private val audit = LoggerFactory.getLogger("AUDIT")

  def recoverFromFailure(backupLocation: Option[String], error: Throwable): Boolean = {
    logger.error(s"Deletion failed, attempting recovery: ${error.getMessage}")
    audit.error(s"RECOVERY_TRIGGERED - Error: ${error.getMessage}, Backup: $backupLocation")

    if (!config.autoRecoveryEnabled) {
      logger.warn("Auto-recovery is disabled. Manual intervention required.")
      audit.warn("AUTO_RECOVERY_DISABLED - Manual intervention required")
      return false
    }
    val location = backupLocation.getOrElse {
      logger.error("No backup location available for recovery")
      audit.error("RECOVERY_FAILED - No backup available")
      return false
    }

    val maxRetries = config.maxRecoveryRetries
    for (attempt <- 1 to maxRetries) {
      logger.info(s"Recovery attempt $attempt/$maxRetries")
      audit.info(s"RECOVERY_ATTEMPT - Attempt: $attempt/$maxRetries")
      try {
        backupManager.restoreFromBackup(spark, config, location)
        if (verifyRestoration()) {
          logger.info(s"Recovery successful on attempt $attempt")
          audit.info(s"RECOVERY_SUCCESS - Attempt: $attempt")
          return true
        }
        logger.warn(s"Recovery verification failed on attempt $attempt")
      } catch {
        case e: Exception =>
          logger.error(s"Recovery attempt $attempt failed: ${e.getMessage}")
          audit.error(s"RECOVERY_ATTEMPT_FAILED - Attempt: $attempt, Error: ${e.getMessage}")
          if (attempt < maxRetries) {
            val waitMs = math.pow(2, attempt).toLong * 1000
            logger.info(s"Waiting $waitMs ms before retry")
            try Thread.sleep(waitMs)
            catch {
              case _: InterruptedException =>
                Thread.currentThread().interrupt()
                logger.error("Recovery interrupted")
                return false
            }
          }
      }
    }
    logger.error(s"Recovery failed after $maxRetries attempts")
    audit.error(s"RECOVERY_FAILED - All $maxRetries attempts exhausted")
    false
  }

  private def verifyRestoration(): Boolean =
    try {
      new CatalogOps(spark).tableExists(config.fullTableName)
    } catch {
      case e: Exception =>
        logger.error(s"Restoration verification failed: ${e.getMessage}")
        false
    }

  /** D10: metadata resync after partial-write failure
    * (RecoveryManager.java:113-131). Never fatal.
    */
  def cleanupPartialWrites(): Unit = {
    logger.info("Cleaning up partial writes")
    audit.info("CLEANUP_START")
    new CatalogOps(spark).refreshAndRepair(config.fullTableName)
    audit.info("CLEANUP_SUCCESS")
  }

  /** Manual-recovery runbook (RecoveryManager.java:136-153), per backup
    * strategy: the hive_table strategy's backup is a catalog table (SQL
    * statements apply verbatim); the path strategy's backup is a raw ORC
    * directory, where SELECT/DROP TABLE against the path would be
    * unrunnable — the operator gets read-ORC/overwrite instructions
    * instead.
    */
  def logManualRecoveryInstructions(backupLocation: Option[String]): Unit = {
    val bk = backupLocation.getOrElse("<no backup available>")
    val steps =
      if (Set("hdfs", "path").contains(config.backupStrategy.toLowerCase))
        s"""|1. Verify backup integrity:
            |   spark.read.orc("$bk").count()
            |
            |2. Restore from backup (dynamic partition overwrite):
            |   spark.read.orc("$bk").write.mode("overwrite")
            |     .insertInto("${config.fullTableName}")
            |
            |3. Verify restoration:
            |   SELECT COUNT(*) FROM ${config.fullTableName}
            |
            |4. Clean up backup after verification:
            |   hadoop fs -rm -r $bk""".stripMargin
      else
        s"""|1. Verify backup integrity:
            |   SELECT COUNT(*) FROM $bk
            |
            |2. Restore from backup:
            |   INSERT OVERWRITE TABLE ${config.fullTableName} SELECT * FROM $bk
            |
            |3. Verify restoration:
            |   SELECT COUNT(*) FROM ${config.fullTableName}
            |
            |4. Clean up backup after verification:
            |   DROP TABLE IF EXISTS $bk""".stripMargin
    val instructions =
      s"""
         |========== MANUAL RECOVERY INSTRUCTIONS ==========
         |Automatic recovery failed. Please perform manual recovery:
         |
         |$steps
         |==================================================
         |""".stripMargin
    logger.error(instructions)
    audit.error(s"MANUAL_RECOVERY_REQUIRED - Backup: $bk")
  }
}

package graft.model

import java.util.Properties

/** Immutable job configuration — the reference's 15-field record
  * (reference: config/JobConfig.java:15-42, defaults at :185-197).
  * Scala case class with defaults replaces the Java builder; a
  * `fromProperties` overlay mirrors JobConfig.java:274-306.
  */
final case class JobConfig(
    database: String,
    tableName: String,
    deletionCriteria: DeletionCriteria,
    partitionColumn: String = "partition_id",
    backupStrategy: String = "hive_table",
    backupLocation: Option[String] = None,
    backupRetentionDays: Int = 7,
    validationEnabled: Boolean = true,
    validationSampleSize: Int = 10000,
    validationTolerancePercent: Double = 0.0,
    autoRecoveryEnabled: Boolean = true,
    maxRecoveryRetries: Int = 3,
    partitionParallelism: Int = 10,
    // reference-parity DEAD knob: batch.size is declared, defaulted, and
    // validated by the reference but never read by any code path there
    // either (JobConfig.java:196; BASELINE.md) — partitionParallelism is
    // the only batching control that exists. Kept so property files written
    // for the reference load unchanged.
    batchSize: Long = 1000000L,
    dryRun: Boolean = false) {

  def fullTableName: String = s"$database.$tableName"

  /** Reference: validate(), JobConfig.java:132-165. */
  def validate(): Unit = {
    require(database.trim.nonEmpty, "Database name cannot be empty")
    require(tableName.trim.nonEmpty, "Table name cannot be empty")
    require(partitionColumn.trim.nonEmpty, "Partition column cannot be empty")
    deletionCriteria.validate()
    require(backupRetentionDays >= 0, "Backup retention days must be non-negative")
    require(validationSampleSize >= 0, "Validation sample size must be non-negative")
    require(validationTolerancePercent >= 0 && validationTolerancePercent <= 100,
      "Validation tolerance percent must be between 0 and 100")
    require(maxRecoveryRetries >= 0, "Max recovery retries must be non-negative")
    require(partitionParallelism > 0, "Partition parallelism must be positive")
    require(batchSize > 0, "Batch size must be positive")
  }

  /** Overlay settings from a properties file
    * (reference: fromProperties, JobConfig.java:274-306; same keys).
    */
  def withProperties(props: Properties): JobConfig = {
    def str(k: String): Option[String] = Option(props.getProperty(k))
    var c = this
    str("backup.strategy").foreach(v => c = c.copy(backupStrategy = v))
    str("backup.location").foreach(v => c = c.copy(backupLocation = Some(v)))
    str("backup.retention.days").foreach(v => c = c.copy(backupRetentionDays = v.toInt))
    str("validation.enabled").foreach(v => c = c.copy(validationEnabled = v.toBoolean))
    str("validation.sample.size").foreach(v => c = c.copy(validationSampleSize = v.toInt))
    str("validation.tolerance.percent").foreach(v => c = c.copy(validationTolerancePercent = v.toDouble))
    str("recovery.auto.enabled").foreach(v => c = c.copy(autoRecoveryEnabled = v.toBoolean))
    str("recovery.max.retries").foreach(v => c = c.copy(maxRecoveryRetries = v.toInt))
    str("partition.parallelism").foreach(v => c = c.copy(partitionParallelism = v.toInt))
    str("batch.size").foreach(v => c = c.copy(batchSize = v.toLong))
    str("dry.run.enabled").foreach(v => c = c.copy(dryRun = v.toBoolean))
    c
  }
}

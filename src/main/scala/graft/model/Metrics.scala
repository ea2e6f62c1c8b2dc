package graft.model

import scala.collection.mutable

/** Mutable run-metrics collector — records read/deleted/retained counters,
  * per-partition record map, backup + validation flags, wall-clock
  * (reference: util/MetricsCollector.java:13-23; report format
  * :110-133).
  *
  * Driver-side only; never serialized into tasks.
  */
final class Metrics {
  private val startTime = System.currentTimeMillis()
  private var endTime = 0L

  var totalRecordsRead = 0L
  var totalRecordsDeleted = 0L
  var totalRecordsRetained = 0L
  var partitionsProcessed = 0
  var partitionsFailed = 0
  val partitionMetrics: mutable.LinkedHashMap[String, Long] = mutable.LinkedHashMap.empty
  var backupCreated = false
  var backupLocation: Option[String] = None
  var validationPassed = false
  /** per-workflow-phase wall time, in insertion (= execution) order */
  val phaseTimings: mutable.LinkedHashMap[String, Long] = mutable.LinkedHashMap.empty

  def recordRecordsRead(n: Long): Unit = totalRecordsRead += n
  def recordRecordsDeleted(n: Long): Unit = totalRecordsDeleted += n
  def recordRecordsRetained(n: Long): Unit = totalRecordsRetained += n
  def incrementPartitionsProcessed(n: Int = 1): Unit = partitionsProcessed += n
  def incrementPartitionsFailed(): Unit = partitionsFailed += 1
  def recordPartitionMetric(partition: String, count: Long): Unit =
    partitionMetrics(partition) = count
  def markBackupCreated(location: String): Unit = {
    backupCreated = true; backupLocation = Some(location)
  }
  def markValidationPassed(passed: Boolean): Unit = validationPassed = passed
  def markJobEnd(): Unit = endTime = System.currentTimeMillis()

  /** Time a workflow phase; nested/repeated phases accumulate. */
  def timePhase[A](name: String)(body: => A): A = {
    val t0 = System.currentTimeMillis()
    try body
    finally phaseTimings(name) =
      phaseTimings.getOrElse(name, 0L) + (System.currentTimeMillis() - t0)
  }

  def executionTimeMs: Long =
    (if (endTime == 0) System.currentTimeMillis() else endTime) - startTime

  /** Text report (reference: generateReport, MetricsCollector.java:110-133). */
  def report: String = {
    val sb = new StringBuilder
    sb.append("\n========== Deletion Job Metrics ==========\n")
    sb.append(f"Execution Time: ${executionTimeMs / 1000.0}%.2f seconds\n")
    sb.append(f"Total Records Read: $totalRecordsRead%,d\n")
    sb.append(f"Total Records Deleted: $totalRecordsDeleted%,d\n")
    sb.append(f"Total Records Retained: $totalRecordsRetained%,d\n")
    sb.append(s"Partitions Processed: $partitionsProcessed\n")
    sb.append(s"Partitions Failed: $partitionsFailed\n")
    sb.append(s"Backup Created: ${if (backupCreated) "Yes" else "No"}\n")
    backupLocation.foreach(l => sb.append(s"Backup Location: $l\n"))
    sb.append(s"Validation Passed: ${if (validationPassed) "Yes" else "No"}\n")
    if (partitionMetrics.nonEmpty) {
      sb.append("\nPartition-Level Metrics:\n")
      partitionMetrics.foreach { case (p, c) => sb.append(f"  $p: $c%,d records\n") }
    }
    if (phaseTimings.nonEmpty) {
      sb.append("\nPhase Timings:\n")
      phaseTimings.foreach { case (p, ms) => sb.append(f"  $p: ${ms / 1000.0}%.2f s\n") }
    }
    sb.append("==========================================\n")
    sb.toString
  }

  override def toString: String = report
}

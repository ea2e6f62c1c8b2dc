package graft.core

import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

/** Session factory with the engine's fixed configuration — the Scala
  * re-expression of the reference's SparkSessionManager
  * (util/SparkSessionManager.java:22-59 and its 9 fixed confs :30-39).
  *
  * Correctness-critical: `spark.sql.sources.partitionOverwriteMode=dynamic`
  * — with static mode an `INSERT OVERWRITE` would wipe every partition of
  * the table, not just the ones present in the written data
  * (reference doc DYNAMIC_PARTITION_VERIFICATION.md:14-41; SURVEY.md §7.4).
  *
  * Scale defaults: AQE on (runtime coalescing + skew-join splitting),
  * shuffle partitions sized to the cluster rather than Spark's legacy 200.
  */
object GraftSession {
  private val logger = LoggerFactory.getLogger(getClass)

  /** The nine fixed confs (reference: SparkSessionManager.java:30-39) plus
    * AQE skew handling, which the reference predates.
    */
  val FixedConfs: Map[String, String] = Map(
    // native Catalyst surface (graft_cosine, …) — see graft.plans.GraftExtensions
    "spark.sql.extensions" -> "graft.plans.GraftExtensions",
    // versioned tables as SQL: SELECT/INSERT/DELETE/UPDATE/MERGE and
    // VERSION/TIMESTAMP AS OF against graft.`/table/dir` — see
    // graft.sources.GraftCatalog
    "spark.sql.catalog.graft" -> "graft.sources.GraftCatalog",
    "spark.sql.sources.partitionOverwriteMode" -> "dynamic",
    "spark.sql.orc.impl" -> "native",
    "spark.sql.orc.enableVectorizedReader" -> "true",
    "spark.sql.orc.filterPushdown" -> "true",
    "spark.sql.hive.convertMetastoreOrc" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // Spark 4 replacement for the removed spark.sql.hive.verifyPartitionPath
    // (skip partitions whose directories vanished)
    "spark.sql.files.ignoreMissingFiles" -> "true",
    "spark.sql.hive.metastorePartitionPruning" -> "true",
    "spark.sql.orc.compression.codec" -> "snappy",
    "spark.sql.session.timeZone" -> "UTC",
    // events.ts is TIMESTAMP(NANOS) parquet — read as long, convert in
    // Tables.events (which requires this conf rather than mutating it)
    "spark.sql.legacy.parquet.nanosAsLong" -> "true"
  )

  def builder(
      appName: String,
      master: Option[String] = None,
      hiveSupport: Boolean = true,
      shufflePartitions: Option[Int] = None,
      extraConfs: Map[String, String] = Map.empty): SparkSession.Builder = {
    var b = SparkSession.builder()
    if (hiveSupport) b = b.enableHiveSupport()
    // extraConfs first (reference applies only "spark." keys —
    // SparkSessionManager.java:42-50), then the fixed confs, shuffle
    // sizing, and app name, so a properties file can TUNE the session but
    // can never override a correctness-critical conf (a user setting
    // partitionOverwriteMode=static would wipe unrelated partitions) or
    // hijack the per-job app name.
    extraConfs.filter(_._1.startsWith("spark.")).foreach { case (k, v) => b = b.config(k, v) }
    FixedConfs.foreach { case (k, v) => b = b.config(k, v) }
    shufflePartitions.foreach(n => b = b.config("spark.sql.shuffle.partitions", n.toString))
    b = b.appName(appName)
    master.foreach(m => b = b.master(m))
    b
  }

  def create(
      appName: String,
      master: Option[String] = None,
      hiveSupport: Boolean = true,
      shufflePartitions: Option[Int] = None,
      extraConfs: Map[String, String] = Map.empty): SparkSession = {
    val spark = builder(appName, master, hiveSupport, shufflePartitions, extraConfs).getOrCreate()
    logger.info(s"SparkSession created: version=${spark.version}, " +
      s"warehouse=${spark.conf.get("spark.sql.warehouse.dir", "default")}")
    spark
  }
}

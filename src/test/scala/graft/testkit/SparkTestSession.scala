package graft.testkit

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** One Hive-enabled SparkSession shared by every suite in the forked test
  * JVM (a single Derby metastore instance per JVM; the reference's
  * integration test uses the same embedded pattern —
  * HiveTableDeletionJobIntegrationTest.java:40-59).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val warehouse = Files.createTempDirectory("graft-warehouse").toString
    val metastore = Files.createTempDirectory("graft-metastore").toString
    val s = GraftSession.builder(
        appName = "graft-test",
        master = Some("local[4]"),
        hiveSupport = true,
        shufflePartitions = Some(4),
        extraConfs = Map(
          "spark.sql.warehouse.dir" -> warehouse,
          "spark.ui.enabled" -> "false"))
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastore/metastore_db;create=true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** A session with its own SQLConf (shared SparkContext + catalog).
    * Suites that mutate conf around plan-shape assertions (AQE off,
    * broadcast threshold) MUST use this — sbt runs suites concurrently in
    * one JVM, so conf flips on the shared session race with every other
    * suite's queries.
    */
  def isolated(): SparkSession = spark.newSession()
}

package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

/** The MV contract: maintained view ≡ direct recompute over the logical
  * current base table, across builds, appends, retractions, replays,
  * compaction, and drained groups.
  */
class MaterializedViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Direct recompute of the view definition over an arbitrary frame. */
  private def recompute(events: org.apache.spark.sql.DataFrame) =
    events.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("mv_hour"),
        col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(round(col("value") * 1e6).cast("long")).cast("long").as("sum_micros"))
      .withColumn("sum_value", round(col("sum_micros") / 1e6, 2))

  private def assertSame(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.count() > 0)
    assert(a.except(b).count() === 0)
    assert(b.except(a).count() === 0)
  }

  test("build + append + retract equals recompute over the post-delete table") {
    val events = Tables.events(spark, sfDir)
    val store = Files.createTempDirectory("graft-mv").toString
    MaterializedView.buildView(events.filter(col("event_id") % 10 < 8), store)
    MaterializedView.appendBatch(events.filter(col("event_id") % 10 >= 8), store, "d1")
    val delPred = col("event_type") === "view" && col("user_id") % 11 === 3
    MaterializedView.retractBatch(events.filter(delPred), store, "t1")
    assertSame(MaterializedView.readView(spark, store),
      recompute(events.filter(!delPred)))
  }

  test("replaying a committed delta is a no-op (exactly-once per deltaId)") {
    val events = Tables.events(spark, sfDir)
    val store = Files.createTempDirectory("graft-mv-replay").toString
    MaterializedView.buildView(events.filter(col("event_id") % 2 === 0), store)
    val batch = events.filter(col("event_id") % 2 =!= 0)
    MaterializedView.appendBatch(batch, store, "b1")
    MaterializedView.appendBatch(batch, store, "b1") // crash-replay of the same call
    val retractable = events.filter(col("event_type") === "click")
    MaterializedView.retractBatch(retractable, store, "r1")
    MaterializedView.retractBatch(retractable, store, "r1") // double-retract would DRAIN groups
    assertSame(MaterializedView.readView(spark, store),
      recompute(events.filter(col("event_type") =!= "click")))
  }

  test("fully-retracted groups disappear instead of lingering at zero") {
    val events = Tables.events(spark, sfDir)
    val store = Files.createTempDirectory("graft-mv-drain").toString
    MaterializedView.buildView(events, store)
    MaterializedView.retractBatch(events.filter(col("event_type") === "purchase"),
      store, "drain")
    val view = MaterializedView.readView(spark, store)
    assert(view.filter(col("event_type") === "purchase").count() === 0)
    assert(view.filter(col("n") <= 0).count() === 0)
  }

  test("compaction folds the journal without changing the view, and empty deltas are safe") {
    val events = Tables.events(spark, sfDir)
    val store = Files.createTempDirectory("graft-mv-compact").toString
    MaterializedView.buildView(events.filter(col("event_id") % 3 === 0), store)
    MaterializedView.appendBatch(events.filter(col("event_id") % 3 =!= 0), store, "a")
    // an ingest day with no rows journals an empty delta — must not break reads
    MaterializedView.appendBatch(events.filter(lit(false)), store, "empty")
    val delPred = col("user_id") % 7 === 2
    MaterializedView.retractBatch(events.filter(delPred), store, "del")
    val before = MaterializedView.readView(spark, store).collect().toSeq
    MaterializedView.compactView(spark, store)
    val after = MaterializedView.readView(spark, store)
    assert(after.collect().toSeq === before)
    // journal is folded: deltas/ no longer contributes roots
    import org.apache.hadoop.fs.Path
    val fs = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(MaterializedView.deltasPath(store))))
    assertSame(after, recompute(events.filter(!delPred)))
  }

  test("syncFromVersions keeps the MV in lockstep with a merged versioned table") {
    import graft.sources.VersionedTable
    val store = Files.createTempDirectory("graft-mv-sync").toString
    val vt = Files.createTempDirectory("graft-mv-sync-vt").toString
    val events = Tables.events(spark, sfDir)
      .filter(col("event_id") < 600)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("micros", round(col("value") * 1e6).cast("long"))
    // v0 = 80% of the slice; MV built over exactly that snapshot
    VersionedTable.create(events.filter(col("event_id") % 10 < 8), vt, "pdate")
    MaterializedView.buildView(VersionedTable.readVersion(spark, vt, 0), store)
    // v1 = MERGE carrying updates (doubled values) and inserts
    val updates = events.filter(col("event_id") % 20 === 0)
      .withColumn("value", col("value") * 2)
      .withColumn("micros", round(col("value") * 1e6).cast("long"))
    val inserts = events.filter(col("event_id") % 10 >= 8)
    VersionedTable.merge(updates.unionByName(inserts), vt, "pdate", "event_id")
    // one journaled CDC delta brings the MV to v1
    MaterializedView.syncFromVersions(spark, vt, store, "event_id",
      Seq("event_type", "user_id", "micros"), 0, 1)
    assertSame(MaterializedView.readView(spark, store),
      recompute(VersionedTable.readVersion(spark, vt, 1)))
    // crash-replay of the same range is a no-op (exactly-once per range)
    MaterializedView.syncFromVersions(spark, vt, store, "event_id",
      Seq("event_type", "user_id", "micros"), 0, 1)
    assertSame(MaterializedView.readView(spark, store),
      recompute(VersionedTable.readVersion(spark, vt, 1)))
  }

  test("maintenance ops refuse to run under another writer's lock, loudly") {
    val events = Tables.events(spark, sfDir)
    val store = Files.createTempDirectory("graft-mv-lock").toString
    MaterializedView.buildView(events, store)
    // another writer (or a crashed one) holds the store lock
    import org.apache.hadoop.fs.Path
    val fs = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$store/${Locking.LockName}"), false)
    out.write("otherhost:4242".getBytes("UTF-8")); out.close()
    val e1 = intercept[IllegalStateException] {
      MaterializedView.appendBatch(events.limit(1), store, "blocked")
    }
    assert(e1.getMessage.contains("otherhost:4242"))
    intercept[IllegalStateException] {
      MaterializedView.compactView(spark, store)
    }
    // no half-committed delta escaped the refusal
    assert(!fs.exists(new Path(s"${MaterializedView.deltasPath(store)}/blocked")))
    // operator breaks a dead holder's lock; maintenance proceeds
    Locking.breakLock(spark, store)
    MaterializedView.appendBatch(events.limit(1), store, "unblocked")
    // the lock is released after a successful run (not leaked)
    assert(!fs.exists(new Path(s"$store/${Locking.LockName}")))
  }

  test("read plan touches only the store, never the base events table") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val store = Files.createTempDirectory("graft-mv-plan").toString
    MaterializedView.buildView(Tables.events(s, sfDir), store)
    MaterializedView.appendBatch(
      Tables.events(s, sfDir).filter(lit(false)), store, "noop")
    val view = MaterializedView.readView(s, store)
    val scans = view.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec => sc.relation.location.rootPaths.mkString(",")
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.contains(store)),
      s"view read must scan the store only, found:\n${scans.mkString("\n")}")
  }
}

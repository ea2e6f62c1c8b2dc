package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Multi-table atomic commit over [[VersionedTable]]s — the coordinator
  * neither Delta nor Iceberg ships, for the mutation shapes where two
  * stores must move TOGETHER or not at all: a base table and its derived
  * index (the takedown contract: deleting from one but crashing before
  * the other leaves a store serving erased rows), or a fact table and
  * its aggregate.
  *
  * Protocol — a write-ahead intent log with two-phase recovery:
  *   1. INTENT: before any mutation, write `_txn/<id>.intent` recording
  *      every participant table's current head version.
  *   2. Run the body (each table's mutations commit versions through the
  *      normal optimistic paths).
  *   3. MARKER: write `_txn/<id>.done`, then delete intent, then marker.
  *
  * Recovery ([[recover]]) inspects the log:
  *   - intent + marker → the body COMPLETED; the crash hit between the
  *     marker write and cleanup. Roll FORWARD: delete both files, all
  *     mutations stand.
  *   - intent alone → the body may be PARTIAL. Roll BACK: each table
  *     [[VersionedTable.rollback]]s to its recorded head (a new version
  *     flipping to the old manifest — vacuum-safe, history preserved),
  *     then the intent is deleted.
  *   - a body exception rolls back immediately and rethrows — the
  *     caller sees either all tables mutated or none.
  *
  * Isolation contract (documented, not enforced): participant tables
  * must not take UNRELATED concurrent commits while a transaction is
  * open — recovery rolls back everything after the recorded head, so an
  * interleaved foreign commit would be reverted with the transaction.
  * This is the standard coordinator assumption; the per-table
  * optimistic CAS still serializes the commits themselves, and
  * transactions on DISJOINT table sets are unrestricted.
  *
  * Scale shape: the log holds version NUMBERS only — intent/marker are
  * O(participants) metadata files; rollback is a metadata-only manifest
  * flip per table. Nothing scales with data size.
  */
object MultiTableTxn {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def intentPath(txnDir: String, id: String) =
    new Path(s"$txnDir/$id.intent")
  private def markerPath(txnDir: String, id: String) =
    new Path(s"$txnDir/$id.done")

  /** One line per participant: `<version>\t<tableDir>`. Tab-separated —
    * table paths may contain anything but newlines/tabs.
    */
  private def writeLog(spark: SparkSession, p: Path,
      entries: Seq[(String, Int)]): Unit = {
    entries.foreach { case (dir, _) =>
      require(!dir.exists(c => c == '\n' || c == '\t'),
        s"table path contains a separator: $dir")
    }
    val f = fs(spark, p.toString)
    val out = f.create(p, true)
    try out.write(entries.map { case (dir, v) => s"$v\t$dir" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readLog(spark: SparkSession, p: Path): Seq[(String, Int)] = {
    val f = fs(spark, p.toString)
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    text.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      (line.substring(i + 1), line.substring(0, i).toInt)
    }
  }

  private def rollbackAll(spark: SparkSession,
      bases: Seq[(String, Int)]): Unit =
    bases.foreach { case (dir, v) =>
      if (VersionedTable.latestVersion(spark, dir) != v)
        VersionedTable.rollback(spark, dir, v)
    }

  /** Run `body` as one atomic transaction over `tables`. On success all
    * mutations stand; on a body exception every table is rolled back to
    * its pre-transaction head and the exception rethrown; on a crash,
    * [[recover]] finishes the job either way. Returns the transaction id
    * (for log inspection).
    */
  def run(spark: SparkSession, txnDir: String, tables: Seq[String])
      (body: => Unit): String = {
    require(tables.nonEmpty, "a transaction needs participants")
    require(tables.distinct.size == tables.size, "duplicate participant")
    val id = java.util.UUID.randomUUID().toString
    val bases = tables.map(t => t -> VersionedTable.latestVersion(spark, t))
    val f = fs(spark, txnDir)
    f.mkdirs(new Path(txnDir))
    writeLog(spark, intentPath(txnDir, id), bases)
    try body
    catch {
      case e: Throwable =>
        rollbackAll(spark, bases)
        f.delete(intentPath(txnDir, id), false)
        throw e
    }
    writeLog(spark, markerPath(txnDir, id), bases)
    f.delete(intentPath(txnDir, id), false)
    f.delete(markerPath(txnDir, id), false)
    id
  }

  /** Intents younger than this are presumed LIVE and left alone by
    * [[recover]] — the same stance [[VersionedTable.DefaultOrphanGraceMs]]
    * takes on staged dirs: a coordinator concurrently inside [[run]] has
    * an intent but no marker, and rolling it back would abort a healthy
    * transaction's committed prefix. Pass 0 only when the caller KNOWS
    * no transaction can be in flight (single-coordinator startup).
    */
  val DefaultIntentGraceMs: Long = 3600L * 1000

  /** Startup recovery for a SINGLE-coordinator deployment: no transaction
    * can be in flight before this process starts, so every intent is a
    * crash leftover and rolls back immediately (grace 0). Multi-writer
    * deployments must use [[recover]] with the grace default and accept
    * its visibility window: a crashed partial transaction's committed
    * prefix stays visible for up to `DefaultIntentGraceMs` before the
    * next recover rolls it back.
    */
  def recoverAtStartup(spark: SparkSession, txnDir: String): (Int, Int) =
    recover(spark, txnDir, intentGraceMs = 0L)

  /** Heal the transaction log after a crash: completed transactions
    * (marker present) roll forward; partial ones (intent alone) roll
    * every participant back to its recorded head — but only once the
    * intent is older than `intentGraceMs`, because an intent-without-
    * marker is also what a LIVE transaction looks like from outside
    * (see [[DefaultIntentGraceMs]]). Idempotent; safe to run at every
    * startup under the grace default. Returns (rolledForward,
    * rolledBack) counts; skipped young intents count in neither.
    */
  def recover(spark: SparkSession, txnDir: String,
      intentGraceMs: Long = DefaultIntentGraceMs): (Int, Int) = {
    val f = fs(spark, txnDir)
    if (!f.exists(new Path(txnDir))) return (0, 0)
    val statuses = f.listStatus(new Path(txnDir)).toSeq
    val names = statuses.map(_.getPath.getName)
    val mtimes = statuses.map(st => st.getPath.getName ->
      st.getModificationTime).toMap
    val intents = names.filter(_.endsWith(".intent")).map(_.stripSuffix(".intent"))
    val markers = names.filter(_.endsWith(".done")).map(_.stripSuffix(".done")).toSet
    val now = System.currentTimeMillis()
    var fwd = 0
    var back = 0
    intents.foreach { id =>
      if (markers.contains(id)) {
        f.delete(markerPath(txnDir, id), false)
        f.delete(intentPath(txnDir, id), false)
        fwd += 1
      } else if (now - mtimes.getOrElse(s"$id.intent", now) >= intentGraceMs) {
        rollbackAll(spark, readLog(spark, intentPath(txnDir, id)))
        f.delete(intentPath(txnDir, id), false)
        back += 1
      } // else: young intent — possibly a live transaction; leave it
    }
    // a marker whose intent is already gone is a fully committed txn
    // whose cleanup lost only the last delete — just remove it
    markers.filterNot(intents.toSet).foreach { id =>
      f.delete(markerPath(txnDir, id), false)
    }
    (fwd, back)
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashes
import graft.sources.Tables

/** Incrementally-maintained materialized aggregate with RETRACTION
  * support — the missing half of the takedown story. [[Takedown]] carries
  * a deletion through the persisted *retrieval* stores (BM25/ANN/MinHash);
  * this module carries appends AND deletions through a persisted derived
  * *aggregate*, so a reporting view stays consistent with the base table
  * without ever re-scanning it (reference semantics: the deletion job's
  * contract is that downstream consumers of the table see the post-delete
  * state — `DeletionExecutor.java:139-230` rewrites the base; an MV over
  * that table must absorb the same delete or silently serve ghosts).
  *
  * The view is the hourly event profile `(mv_hour, event_type) ->
  * (n, sum_micros)` — both measures are ADDITIVE, the property that makes
  * a delete a sign-flipped append (a retraction delta) instead of a
  * recompute. Non-additive measures (distinct users, min/max) are out of
  * contract by design: they cannot be retracted from a summary alone.
  * Values ride as integer micro-units (`round(value·1e6)` → BIGINT, the
  * Search/QualityModel discipline), so the fold is order-free and the
  * DuckDB recompute oracle matches bit-for-bit.
  *
  * Store layout under `storeDir`:
  *   - `state/`  — the folded base summary, hive-partitioned by
  *     `shard = pmod(polyHash(mv_hour|event_type), GroupShards)`: a fixed
  *     fan-out (the [[AnnIndex.CellShards]] discipline) so partition-dir
  *     metadata stays bounded as hours accumulate.
  *   - `deltas/<deltaId>/` — journaled group-sized delta summaries, each
  *     committed by ONE atomic rename from a staging dir ([[Search
  *     .appendToIndex]] exactly-once contract): a crash before the rename
  *     leaves invisible staging litter, a replay of a committed deltaId
  *     is a no-op, never a double-count — double-counting an append
  *     inflates the view, double-counting a retraction DRAINS it, both
  *     silent, which is why exactly-once is load-bearing here.
  *
  * Scale shape: maintenance touches O(batch) rows once (one map-side-
  * combined aggregate per delta — a batch collapses to its group summary
  * BEFORE anything is written); a read folds `state/` + the bounded
  * journal, all O(groups), never O(events). At 100 TB the base table is
  * scanned exactly once ever (the build); every daily append/delete and
  * every read is group-sized.
  */
object MaterializedView {

  def statePath(storeDir: String): String = s"$storeDir/state"
  def deltasPath(storeDir: String): String = s"$storeDir/deltas"

  /** Fixed group-shard fan-out for `state/` (constant, not data-derived —
    * same reasoning as [[Search.TermShards]]).
    */
  val GroupShards = 32

  private def groupShardCol =
    pmod(Hashes.polyHash(concat_ws("|", col("mv_hour"), col("event_type"))),
      lit(GroupShards.toLong)).cast("int")

  /** A batch collapsed to its signed group summary. `sign` = +1 for an
    * append, −1 for a retraction; the measures are multiplied through so
    * the read-side fold is a plain SUM either way.
    */
  private def summaryRows(events: DataFrame, sign: Int): DataFrame =
    events.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("mv_hour"),
        col("event_type"))
      .agg((count(lit(1)) * sign).cast("long").as("n"),
        (coalesce(sum(round(col("value") * 1e6).cast("long")), lit(0L)) * sign)
          .cast("long").as("sum_micros"))

  /** Build (overwrite) the view state from the current base table — the
    * one full scan this store ever pays.
    */
  def buildView(events: DataFrame, storeDir: String): Unit =
    summaryRows(events, 1)
      .withColumn("shard", groupShardCol)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(statePath(storeDir))

  /** Journal a signed delta exactly-once per `deltaId`: aggregate the
    * batch to its group summary, stage, commit via one atomic rename.
    * Appends and retractions share this path — a deletion's retraction is
    * the same summary with the measures negated.
    */
  def applyDelta(events: DataFrame, storeDir: String, deltaId: String,
      sign: Int): Unit = {
    require(sign == 1 || sign == -1, s"sign must be ±1, got $sign")
    require(deltaId.matches("[A-Za-z0-9_-]+"), s"unsafe deltaId: $deltaId")
    val spark = events.sparkSession
    Locking.withStoreLock(spark, storeDir) {
    import org.apache.hadoop.fs.Path
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = new Path(s"${deltasPath(storeDir)}/$deltaId")
    if (fs.exists(committed)) return // replay shield: exactly-once per deltaId
    val staging = s"$storeDir/deltas_staging_$deltaId"
    fs.delete(new Path(staging), true)
    summaryRows(events, sign).write.mode("overwrite").parquet(staging)
    fs.mkdirs(new Path(deltasPath(storeDir)))
    require(fs.rename(new Path(staging), committed),
      s"could not commit delta $deltaId")
    }
  }

  def appendBatch(events: DataFrame, storeDir: String, deltaId: String): Unit =
    applyDelta(events, storeDir, deltaId, sign = 1)

  /** Absorb a MIXED CDC batch — rows carry an `op` column ('I' insert /
    * 'D' delete) — as ONE journaled delta: per-row sign folds into the
    * same group summary, so an insert-plus-its-own-delete in one batch
    * nets to zero and the exactly-once guarantee covers the whole batch
    * atomically (the streaming ingestion shape, [[graft.streaming]]).
    */
  def applyCdcBatch(events: DataFrame, storeDir: String, deltaId: String): Unit = {
    require(deltaId.matches("[A-Za-z0-9_-]+"), s"unsafe deltaId: $deltaId")
    val spark = events.sparkSession
    Locking.withStoreLock(spark, storeDir) {
    import org.apache.hadoop.fs.Path
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = new Path(s"${deltasPath(storeDir)}/$deltaId")
    if (fs.exists(committed)) return
    val staging = s"$storeDir/deltas_staging_$deltaId"
    fs.delete(new Path(staging), true)
    val signed = when(col("op") === "D", lit(-1L)).otherwise(lit(1L))
    events.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("mv_hour"),
        col("event_type"))
      .agg(sum(signed).cast("long").as("n"),
        coalesce(sum(signed * round(col("value") * 1e6).cast("long")), lit(0L))
          .cast("long").as("sum_micros"))
      .write.mode("overwrite").parquet(staging)
    fs.mkdirs(new Path(deltasPath(storeDir)))
    require(fs.rename(new Path(staging), committed),
      s"could not commit delta $deltaId")
    }
  }

  /** Absorb a deletion: `deleted` is the frame of rows the deletion job
    * removed from the base table (the complement of what it retained —
    * exactly what [[graft.core.DeletionExecutor]] materializes before the
    * rewrite), journaled as a negative delta.
    */
  def retractBatch(deleted: DataFrame, storeDir: String, deltaId: String): Unit =
    applyDelta(deleted, storeDir, deltaId, sign = -1)

  /** Keep the MV in lockstep with a [[graft.sources.VersionedTable]]
    * across an arbitrary version range — the batch form of the streaming
    * CDC→MV loop ([[graft.streaming.StreamingMv]]): [[graft.sources
    * .VersionedTable.versionDiff]] classifies keys, the removed/changed
    * keys pull their OLD rows from `fromV` (op 'D') and the added/changed
    * keys their NEW rows from `toV` (op 'I'), and the whole range lands
    * as ONE journaled CDC delta — exactly-once per (fromV, toV), so a
    * crash-replayed sync cannot double-apply. An updated row becomes
    * D(old)+I(new), which is precisely retraction + re-insert under the
    * additive-measure contract.
    *
    * Scale shape: the diff is a key+fingerprint equi-join (O(|vA|+|vB|)
    * shuffle, no full rows); row fetches are key-joins against the two
    * snapshots; the delta collapses to group size before writing. Rows
    * must carry the view's columns (ts, event_type, value) and the
    * fingerprint must be quantized (no raw doubles), as versionDiff
    * documents.
    */
  def syncFromVersions(spark: SparkSession, tableDir: String, mvDir: String,
      keyCol: String, fingerprintCols: Seq[String], fromV: Int,
      toV: Int): Unit = {
    import graft.sources.VersionedTable
    val diff = VersionedTable
      .versionDiff(spark, tableDir, keyCol, fingerprintCols, fromV, toV)
    val dels = VersionedTable.readVersion(spark, tableDir, fromV)
      .join(diff.filter(col("status").isin("removed", "changed"))
        .select(keyCol), Seq(keyCol))
      .withColumn("op", lit("D"))
    val ins = VersionedTable.readVersion(spark, tableDir, toV)
      .join(diff.filter(col("status").isin("added", "changed"))
        .select(keyCol), Seq(keyCol))
      .withColumn("op", lit("I"))
    applyCdcBatch(dels.unionByName(ins), mvDir, s"cdcsync-$fromV-$toV")
  }

  /** Existing non-empty summary roots: `state/` plus every committed
    * delta. Driver-side listing bounded by the journal length between
    * [[compactView]] runs — maintenance cadence, never corpus size. Empty
    * parquet roots (a delta of an empty batch) are dropped before the
    * multi-root read ([[Search]] discipline: they would fail schema
    * inference).
    */
  private def summaryRoots(spark: SparkSession, storeDir: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasParquet(p: Path): Boolean = {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
    val state = new Path(statePath(storeDir))
    val deltas = new Path(deltasPath(storeDir))
    val deltaRoots =
      if (!fs.exists(deltas)) Seq.empty
      else fs.listStatus(deltas).toSeq.filter(_.isDirectory).map(_.getPath)
        .sortBy(_.getName)
    (Seq(state) ++ deltaRoots).filter(p => fs.exists(p) && hasParquet(p))
      .map(_.toString)
  }

  /** The current view: base state + journal folded by one group-sized
    * SUM; groups whose count drains to zero disappear (a fully-deleted
    * hour leaves no ghost row). Reads parquet only — no scan of the base
    * table survives in this plan.
    */
  def readView(spark: SparkSession, storeDir: String): DataFrame = {
    val (stateRoots, deltaRoots) =
      summaryRoots(spark, storeDir).partition(_ == statePath(storeDir))
    require(stateRoots.nonEmpty || deltaRoots.nonEmpty,
      s"empty materialized view store: $storeDir")
    // state/ is hive-partitioned (shard=N), deltas are flat — one mixed
    // multi-root read trips partition discovery, so read per layout and
    // union (both are group-sized)
    val cols = Seq("mv_hour", "event_type", "n", "sum_micros")
    val parts =
      stateRoots.map(r => spark.read.parquet(r).select(cols.head, cols.tail: _*)) ++
      (if (deltaRoots.isEmpty) Nil
       else Seq(spark.read.parquet(deltaRoots: _*).select(cols.head, cols.tail: _*)))
    parts.reduce(_ unionByName _)
      .groupBy("mv_hour", "event_type")
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sum_micros")).cast("long").as("sum_micros"))
      .filter(col("n") > 0)
      .withColumn("sum_value", round(col("sum_micros") / 1e6, 2))
      .orderBy("mv_hour", "event_type")
  }

  /** Fold the delta journal back into `state/` — [[Search.compactIndex]]'s
    * retire-install swap applied to the MV (crash before the READY marker
    * leaves the live store untouched; after it, re-running completes the
    * installs). Single-writer maintenance op, ENFORCED by the store lock
    * ([[Locking]]): a `compactView` racing an `applyDelta` could retire
    * `deltas/` mid-commit and drop the delta silently — the lock turns
    * that into a loud refusal instead. A crashed run leaves both the lock
    * and the recovery markers; after `breakLock`, re-running completes.
    */
  def compactView(spark: SparkSession, storeDir: String): Unit =
    Locking.withStoreLock(spark, storeDir) {
    import org.apache.hadoop.fs.Path
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ready = new Path(s"$storeDir/compact_READY")
    val retired = new Path(s"$storeDir/deltas_retired")
    if (!fs.exists(ready)) {
      if (fs.exists(retired)) { // crashed pre-READY run left a retirement
        require(fs.rename(retired, new Path(deltasPath(storeDir))),
          s"could not restore $retired")
      }
      if (!fs.exists(new Path(deltasPath(storeDir)))) return // nothing to fold
      readView(spark, storeDir)
        .select("mv_hour", "event_type", "n", "sum_micros")
        .withColumn("shard", groupShardCol)
        .repartition(col("shard"))
        .write.mode("overwrite").partitionBy("shard")
        .parquet(s"$storeDir/state_compact")
      fs.create(ready, true).close()
    }
    if (fs.exists(new Path(deltasPath(storeDir))))
      require(fs.rename(new Path(deltasPath(storeDir)), retired),
        "could not retire deltas/")
    val live = new Path(statePath(storeDir))
    val staged = new Path(s"$storeDir/state_compact")
    val bak = new Path(s"$storeDir/state_compactold")
    if (fs.exists(staged)) {
      fs.delete(bak, true)
      if (fs.exists(live))
        require(fs.rename(live, bak), s"could not retire $live")
      require(fs.rename(staged, live), s"could not install $staged")
      fs.delete(bak, true)
    }
    fs.delete(retired, true)
    fs.delete(ready, false)
  }

  // --------------------------- surface entry

  /** Deterministic maintenance scenario over the `events` fixture, fully
    * oracle-checkable: build the view on the first ~80% of events
    * (`event_id % 10 < 8`), journal the remaining ~20% as an append
    * batch, then journal a deletion's retraction (`event_type = 'view'
    * AND user_id % 11 = 3` — the time-window-delete shape aimed at a
    * whole category slice), and read. The maintained view must equal a
    * direct recompute over the post-delete base table — which is exactly
    * the DuckDB oracle, so any drift (double-count, lost delta, ghost
    * group) hash-fails.
    */
  def mvIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val storeDir = Stores.temp("graft_mv")
    buildView(events.filter(col("event_id") % 10 < 8), storeDir)
    appendBatch(events.filter(col("event_id") % 10 >= 8), storeDir, "day1")
    retractBatch(
      events.filter(col("event_type") === "view" && col("user_id") % 11 === 3),
      storeDir, "takedown1")
    readView(spark, storeDir)
  }

  /** Direct recompute over the logical post-delete table — maintained
    * view ≡ recompute is the MV contract.
    */
  def mvIncrementalSql(): String =
    """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS mv_hour,
      |  event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros,
      |  round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 2) AS sum_value
      |FROM events
      |WHERE NOT (event_type = 'view' AND user_id % 11 = 3)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin
}

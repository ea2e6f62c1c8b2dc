package graft.sources

import scala.util.matching.Regex

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-versioned parquet table with partition-granular copy-on-write
  * deletes and time travel — the snapshot layer the reference's deletion
  * job implies but never materializes: its backup/restore pair
  * (`BackupManager.java:21-61`) exists only because the base table has a
  * single mutable state; a versioned table makes every pre-delete state a
  * first-class readable snapshot instead (the public Delta/Iceberg log
  * design, re-expressed minimally).
  *
  * Layout under `tableDir`:
  *   - `data/add-v<N>-<nonce>/<part>=<val>/` — immutable hive-partitioned
  *     parquet leaves, one dir per committing version (the nonce makes
  *     racing writers' staged dirs disjoint). The partition
  *     column is DUPLICATED into the data (`<part>` keeps its value
  *     column; the directory key is `<part>__p`), so snapshot reads union
  *     leaf dirs directly — no partition-discovery reconstruction across
  *     mixed roots.
  *   - `manifests/v<N>.json` — the version: an ordered list of live leaf
  *     paths relative to `tableDir`. Committed by writing
  *     `manifests/_staging_v<N>.json` and ONE atomic rename — a crash
  *     leaves an underscore-invisible staging file, never a half manifest
  *     ([[graft.pipeline.Search.appendToIndex]] discipline).
  *
  * Mutation is partition-granular copy-on-write, exactly the reference
  * core's rewrite unit (`DeletionExecutor.java:139-230` rewrites affected
  * partitions, drops emptied ones): a delete prunes the scan to affected
  * leaves, writes survivors into a fresh `add-v<N>` dir, and the new
  * manifest swaps only those leaf entries. Untouched leaves are carried
  * by REFERENCE — shared bytes across versions, which is what makes
  * time travel free and deletes O(affected partitions), not O(table).
  *
  * Scale shape: manifests are leaf-path lists — O(partitions + appends)
  * driver-side metadata, bounded by [[vacuum]]/compaction cadence like
  * every store journal here. Reads are plain multi-root parquet scans, so
  * Catalyst pushdown/pruning applies per leaf.
  *
  * Concurrency: commits are OPTIMISTIC. Every mutation stages its bytes
  * under a writer-unique dir name (`add-v<N>-<nonce>` — two racing
  * writers can never clobber each other's staged files), then CASes on
  * the manifest rename; losing the race raises
  * [[CommitConflictException]] and the public mutators retry against the
  * new head (re-reading it, so a delete retried over a concurrent append
  * sees the appended rows). Loser-attempt dirs become orphans that
  * [[vacuum]] sweeps. Only [[vacuum]]/[[compact]] remain
  * single-writer-only maintenance ops (documented there).
  */
object VersionedTable {

  /** A manifest commit lost its CAS to a concurrent committer. Public
    * mutators catch this and retry against the new head.
    */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  private val MaxCommitAttempts = 5

  private def withCommitRetry[A](op: => A): A = {
    var attempt = 1
    var out: Option[A] = None
    while (out.isEmpty) {
      try out = Some(op)
      catch {
        case e: CommitConflictException =>
          if (attempt >= MaxCommitAttempts) throw e
          attempt += 1
      }
    }
    out.get
  }

  /** Short writer-unique suffix for staged dir names — uniqueness across
    * JVMs is the point (two processes racing on the same table), so this
    * is a random token, not a counter.
    */
  private def nonce(): String =
    java.util.UUID.randomUUID().toString.substring(0, 8)

  private val ManifestRe: Regex = "v(\\d+)\\.json".r

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestsDir(tableDir: String) = s"$tableDir/manifests"

  private def partDirCol(partCol: String) = s"${partCol}__p"

  /** A version's full state: live data leaves, live position-delete dirs
    * (merge-on-read — see [[deleteMergeOnRead]]), the subset of leaves
    * any delete vector touches (`dirty`), and the per-channel latest
    * committed batch ids (`txns`, entries `channel=batchId` — the public
    * Delta `txn` action shape backing [[appendOnce]]'s idempotence).
    * Recording `dirty` in the manifest is what lets a snapshot read split
    * clean leaves (plain scan, no join) from dirty ones (anti-join)
    * without running a discovery job first.
    */
  private case class VManifest(leaves: Seq[String], deletes: Seq[String],
      dirty: Seq[String], txns: Seq[String] = Nil) {
    def dirtySet: Set[String] = dirty.toSet
  }

  /** Versions present, ascending. Staging files are invisible. */
  def versions(spark: SparkSession, tableDir: String): Seq[Int] = {
    val f = fs(spark, tableDir)
    val dir = new Path(manifestsDir(tableDir))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.flatMap(st => st.getPath.getName match {
      case ManifestRe(n) => Some(n.toInt)
      case _ => None
    }).sorted
  }

  def latestVersion(spark: SparkSession, tableDir: String): Int = {
    val vs = versions(spark, tableDir)
    require(vs.nonEmpty, s"no versioned table at $tableDir")
    vs.last
  }

  /** Fixed-shape parse of one named string array out of the manifest JSON.
    * Exact only because [[writeManifest]] REFUSES any entry containing
    * `"`/`,`/`]`: hive leaf encoding escapes most separators but NOT the
    * comma, so a partition value containing one would otherwise corrupt
    * the round-trip silently — the validation turns it into a loud
    * commit-time error instead.
    */
  private def parseArray(text: String, key: String): Seq[String] = {
    val marker = "\"" + key + "\":["
    val i = text.indexOf(marker)
    if (i < 0) Seq.empty
    else {
      val start = i + marker.length
      val body = text.substring(start, text.indexOf(']', start)).trim
      if (body.isEmpty) Seq.empty
      else body.split(',').toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\""))
    }
  }

  private def readManifestFull(spark: SparkSession, tableDir: String,
      version: Int): VManifest = {
    val f = fs(spark, tableDir)
    val p = new Path(s"${manifestsDir(tableDir)}/v$version.json")
    require(f.exists(p), s"version $version does not exist at $tableDir")
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // absent keys (older manifests) parse as empty — back-compatible
    VManifest(parseArray(text, "leaves"), parseArray(text, "deletes"),
      parseArray(text, "dirty"), parseArray(text, "txns"))
  }

  private def writeManifest(spark: SparkSession, tableDir: String,
      version: Int, leaves: Seq[String], deletes: Seq[String] = Nil,
      dirty: Seq[String] = Nil, txns: Seq[String] = Nil): Unit = {
    (leaves ++ deletes ++ dirty ++ txns).foreach(e =>
      require(!e.exists(c => c == '"' || c == ',' || c == ']'),
        s"manifest entry contains a JSON separator (partition value with " +
          s"',', '\"' or ']'?): $e"))
    val f = fs(spark, tableDir)
    f.mkdirs(new Path(manifestsDir(tableDir)))
    val staging = new Path(s"${manifestsDir(tableDir)}/_staging_v$version.json")
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"version":$version,"leaves":${arr(leaves)},""" +
      s""""deletes":${arr(deletes)},"dirty":${arr(dirty)},""" +
      s""""txns":${arr(txns)}}"""
    val out = f.create(staging, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val committed = new Path(s"${manifestsDir(tableDir)}/v$version.json")
    // CAS: rename refuses an existing destination, so exactly one of two
    // racing committers lands; the exists() probe just fails faster
    if (f.exists(committed) || !f.rename(staging, committed)) {
      f.delete(staging, false)
      throw new CommitConflictException(
        s"version $version already committed at $tableDir")
    }
  }

  /** Write a frame as a new immutable data dir, return its leaf paths
    * (relative to tableDir). The partition column stays in the data; its
    * duplicate drives the directory layout.
    */
  private def writeDataDir(df: DataFrame, tableDir: String, version: Int,
      partCol: String): Seq[String] = {
    val spark = df.sparkSession
    val rel = s"data/add-v$version-${nonce()}"
    val pdir = partDirCol(partCol)
    df.withColumn(pdir, col(partCol))
      .repartition(col(pdir))
      .write.mode("overwrite").partitionBy(pdir).parquet(s"$tableDir/$rel")
    val f = fs(spark, tableDir)
    f.listStatus(new Path(s"$tableDir/$rel")).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$pdir="))
      .map(st => s"$rel/${st.getPath.getName}")
      .sorted
  }

  /** The physical data dir a version's commit wrote (test/inspection
    * seam — dir names carry a writer nonce, so specs locate them by
    * version prefix instead of hard-coding the name).
    */
  private[graft] def physicalDataDir(spark: SparkSession, tableDir: String,
      version: Int): String = {
    val f = fs(spark, tableDir)
    val hits = f.listStatus(new Path(s"$tableDir/data")).toSeq
      .map(_.getPath)
      .filter(_.getName.startsWith(s"add-v$version-"))
    require(hits.size == 1,
      s"expected exactly one data dir for v$version at $tableDir, got $hits")
    hits.head.toString
  }

  private def leafPartValue(leaf: String): String = {
    val name = leaf.substring(leaf.lastIndexOf('/') + 1)
    // hive leaf names are <key>=<url-encoded value>
    java.net.URLDecoder.decode(name.substring(name.indexOf('=') + 1), "UTF-8")
  }

  /** Create the table at version 0. */
  def create(df: DataFrame, tableDir: String, partCol: String): Unit = {
    require(versions(df.sparkSession, tableDir).isEmpty,
      s"table already exists at $tableDir")
    writeManifest(df.sparkSession, tableDir, 0,
      writeDataDir(df, tableDir, 0, partCol))
  }

  /** Append a batch as a new version: new leaves are ADDED to the live
    * list; existing leaves are untouched (same-partition batches coexist
    * as multiple leaves until [[compact]]). The prior version's delete
    * vectors and dirty set carry over verbatim — an append after a
    * [[deleteMergeOnRead]] must not resurrect vector-deleted rows (the
    * new leaves are never dirty: no existing vector can reference a file
    * that did not exist when the vector was written).
    */
  def append(df: DataFrame, tableDir: String, partCol: String): Unit =
    withCommitRetry(appendAttempt(df, tableDir, partCol,
      latestVersion(df.sparkSession, tableDir)))

  /** One optimistic append attempt against an explicitly named base
    * version — raises [[CommitConflictException]] if `baseVersion` is no
    * longer the head. Test seam for the retry loop; [[append]] is the
    * public path.
    */
  private[graft] def appendAttempt(df: DataFrame, tableDir: String,
      partCol: String, baseVersion: Int): Unit = {
    val spark = df.sparkSession
    val v = baseVersion + 1
    val m = readManifestFull(spark, tableDir, baseVersion)
    requireSchemaMatch(df, spark, tableDir, m)
    writeManifest(spark, tableDir, v,
      m.leaves ++ writeDataDir(df, tableDir, v, partCol), m.deletes, m.dirty,
      m.txns)
  }

  /** Appends REFUSE a batch whose column set differs from the table's:
    * multi-root parquet reads don't merge schemas, so a drifted batch
    * would otherwise read back with its new columns silently DROPPED (or
    * as nulls) depending on which file the schema was sampled from —
    * silent, order-dependent corruption. Schema evolution is explicitly
    * out of contract; migrate by rewriting through [[compact]] with the
    * new schema applied. One footer read per append — metadata-sized.
    */
  private def requireSchemaMatch(df: DataFrame, spark: SparkSession,
      tableDir: String, m: VManifest): Unit = {
    if (m.leaves.isEmpty) return
    val tableCols = readLeaves(spark, tableDir, m.leaves.take(1)).columns.toSet
    val batchCols = df.columns.toSet
    require(tableCols == batchCols,
      s"append schema mismatch: table columns ${tableCols.toSeq.sorted
        .mkString("[", ",", "]")} vs batch ${batchCols.toSeq.sorted
        .mkString("[", ",", "]")}; schema evolution is out of contract — " +
        "rewrite through compact() with the new schema instead")
  }

  /** IDEMPOTENT append — the public Delta `txn` (setTransaction) design:
    * the manifest records, per `channel`, the LATEST committed batch id;
    * an append whose (channel, batchId) matches the recorded one is a
    * replayed commit and no-ops. This is exactly the shield an
    * at-least-once writer needs (Structured Streaming's `foreachBatch`
    * replays only the last in-flight batch id on recovery, so latest-only
    * is sufficient); it is NOT a general dedup of arbitrarily old batch
    * ids — batch ids within one channel must be issued in order, which a
    * streaming epoch id satisfies by construction.
    */
  def appendOnce(df: DataFrame, tableDir: String, partCol: String,
      channel: String, batchId: String): Unit = {
    require(channel.matches("[A-Za-z0-9_-]+"), s"unsafe channel: $channel")
    require(batchId.matches("[A-Za-z0-9_-]+"), s"unsafe batchId: $batchId")
    withCommitRetry {
      val spark = df.sparkSession
      val base = latestVersion(spark, tableDir)
      val m = readManifestFull(spark, tableDir, base)
      val entry = s"$channel=$batchId"
      if (m.txns.contains(entry)) return // replayed commit: exactly-once
      requireSchemaMatch(df, spark, tableDir, m)
      val txns = m.txns.filterNot(_.startsWith(channel + "=")) :+ entry
      writeManifest(spark, tableDir, base + 1,
        m.leaves ++ writeDataDir(df, tableDir, base + 1, partCol),
        m.deletes, m.dirty, txns)
    }
  }

  /** Copy-on-write delete: rows matching `pred` disappear from the new
    * version. Only leaves whose partition value contains a matching row
    * are rewritten (pruned scan → survivors → fresh data dir); all other
    * leaves carry over by reference. An emptied partition simply has no
    * survivor leaf — the drop-partition path. Prior versions still read
    * the deleted rows: takedown-grade erasure additionally requires
    * [[vacuum]] of the pre-delete versions (physical removal), the same
    * two-step contract as Delta's DELETE + VACUUM.
    */
  def delete(spark: SparkSession, tableDir: String, partCol: String,
      pred: Column): Unit = withCommitRetry {
    val v = latestVersion(spark, tableDir) + 1
    val m = readManifestFull(spark, tableDir, v - 1)
    val current = readView(spark, tableDir, m)
    // affected partition values: metadata-sized driver list (the
    // reference core's identifyAffectedPartitions shape)
    val affected = current.filter(pred).select(col(partCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSet
    if (affected.isEmpty) {
      writeManifest(spark, tableDir, v, m.leaves, m.deletes, m.dirty, m.txns)
      return
    }
    val (hit, kept) = m.leaves.partition(l => affected.contains(leafPartValue(l)))
    // survivors come from the VECTOR-APPLIED view of the hit leaves — a
    // copy-on-write rewrite must not resurrect rows a prior merge-on-read
    // delete already removed. Vector entries pointing at the rewritten
    // (now-unreferenced) leaves become inert; [[compact]]/[[vacuum]] fold
    // and erase them.
    val survivors = readView(spark, tableDir, m, onlyLeaves = Some(hit))
      .filter(!pred)
    val newLeaves = writeDataDir(survivors, tableDir, v, partCol)
    writeManifest(spark, tableDir, v, kept ++ newLeaves, m.deletes,
      m.dirty.filter(kept.contains), m.txns)
  }

  /** Merge-on-read delete (position delete vectors — the public
    * Iceberg/Delta deletion-vector design): instead of rewriting any data
    * leaf, ONE pass over the current view finds matching rows and writes
    * their physical positions — (tableDir-relative file path,
    * `_metadata.row_index`) pairs — to an immutable `deletes/del-v<N>/`
    * parquet dir; the new manifest carries the same leaves plus the vector
    * and the set of leaves it touches. Write cost is O(matches), not
    * O(affected partitions) — the right trade when deletes are frequent
    * and small relative to partitions (takedowns), with [[compact]]
    * folding vectors back into data on maintenance cadence.
    *
    * Snapshot reads apply vectors as a (file, pos) LEFT ANTI join on the
    * DIRTY leaves only; clean leaves scan plain (the manifest's `dirty`
    * list makes the split free). Positions of already-vector-deleted rows
    * are excluded at write time, so vectors never overlap and each one's
    * size reflects exactly the rows its own delete removed.
    */
  def deleteMergeOnRead(spark: SparkSession, tableDir: String,
      pred: Column): Unit = withCommitRetry {
    val v = latestVersion(spark, tableDir) + 1
    val m = readManifestFull(spark, tableDir, v - 1)
    val matches = readView(spark, tableDir, m, keepPositions = true)
      .filter(pred)
      .select(col(PosFile).as("file"), col(PosIdx).as("pos"))
    val rel = s"deletes/del-v$v-${nonce()}"
    matches.write.mode("overwrite").parquet(s"$tableDir/$rel")
    // dirty leaves of THIS vector: parent dirs of the referenced files —
    // a manifest-bounded distinct, computed once at write time so reads
    // never run a discovery job
    val touched = spark.read.parquet(s"$tableDir/$rel")
      .select("file").distinct().collect()
      .map(r => { val f = r.getString(0); f.substring(0, f.lastIndexOf('/')) })
      .toSet
    if (touched.isEmpty) {
      fs(spark, tableDir).delete(new Path(s"$tableDir/$rel"), true)
      writeManifest(spark, tableDir, v, m.leaves, m.deletes, m.dirty, m.txns)
    } else
      // a commit failure (crash, concurrent-commit collision) must not
      // leave the vector dir as a permanent unreferenced orphan — no
      // manifest will ever point at it, so [[vacuum]]'s referenced-path
      // sweep would otherwise never collect it
      try writeManifest(spark, tableDir, v, m.leaves, m.deletes :+ rel,
        (m.dirtySet ++ touched).toSeq.sorted, m.txns)
      catch { case e: Throwable =>
        fs(spark, tableDir).delete(new Path(s"$tableDir/$rel"), true)
        throw e
      }
  }

  private def readLeaves(spark: SparkSession, tableDir: String,
      leaves: Seq[String]): DataFrame = {
    require(leaves.nonEmpty, "cannot read an empty leaf set")
    spark.read.parquet(leaves.map(l => s"$tableDir/$l"): _*)
  }

  // internal position column names — double-underscored to stay clear of
  // user schemas; dropped before any view leaves this object
  private val PosFile = "__vt_file"
  private val PosIdx = "__vt_pos"

  /** tableDir-relative physical position of each row, anchored on the
    * table's own absolute path (not a `data/add-v<N>` suffix pattern — a
    * tableDir that itself contained such a segment would make a suffix
    * match disagree with manifest leaf paths and silently disable the
    * delete-vector anti-join). `_metadata.file_path` is a qualified URI
    * whose scheme/authority rendering varies by filesystem, so the anchor
    * is the scheme-free normalized path, located then substringed.
    */
  private def withPositions(df: DataFrame, tableDir: String): DataFrame = {
    val marker =
      fs(df.sparkSession, tableDir).makeQualified(new Path(tableDir))
        .toUri.getPath + "/"
    df.withColumn(PosFile,
        col("_metadata.file_path").substr(
          locate(marker, col("_metadata.file_path")) + marker.length,
          lit(Int.MaxValue)))
      .withColumn(PosIdx, col("_metadata.row_index"))
  }

  /** The vector-applied view of a manifest (optionally restricted to a
    * leaf subset): clean leaves scan plain; dirty leaves scan with
    * positions and LEFT ANTI join the union of delete vectors. With
    * `keepPositions` the internal position columns stay on the output —
    * only [[deleteMergeOnRead]] wants them.
    */
  private def readView(spark: SparkSession, tableDir: String, m: VManifest,
      onlyLeaves: Option[Seq[String]] = None,
      keepPositions: Boolean = false): DataFrame = {
    val leaves = onlyLeaves.getOrElse(m.leaves)
    def finish(df: DataFrame) = if (keepPositions) df else df.drop(PosFile, PosIdx)
    if (m.deletes.isEmpty) {
      val plain = readLeaves(spark, tableDir, leaves)
      return if (keepPositions) withPositions(plain, tableDir) else plain
    }
    val (dirty, clean) = leaves.partition(m.dirtySet.contains)
    val del = readLeaves(spark, tableDir, m.deletes)
      .select(col("file").as(PosFile), col("pos").as(PosIdx))
    val dirtyView = if (dirty.isEmpty) None
      else Some(finish(withPositions(readLeaves(spark, tableDir, dirty), tableDir)
        .join(del, Seq(PosFile, PosIdx), "left_anti")))
    val cleanView = if (clean.isEmpty) None
      else {
        val c = readLeaves(spark, tableDir, clean)
        Some(if (keepPositions) withPositions(c, tableDir) else c)
      }
    (cleanView, dirtyView) match {
      case (Some(c), Some(d)) => c.unionByName(d)
      case (Some(c), None)    => c
      case (None, Some(d))    => d
      case (None, None) =>
        throw new IllegalStateException("cannot read an empty leaf set")
    }
  }

  /** Snapshot read at a version (time travel), delete vectors applied. */
  def readVersion(spark: SparkSession, tableDir: String, version: Int): DataFrame =
    readView(spark, tableDir, readManifestFull(spark, tableDir, version))

  def readLatest(spark: SparkSession, tableDir: String): DataFrame =
    readVersion(spark, tableDir, latestVersion(spark, tableDir))

  /** MERGE (upsert) a batch by key — the reference's deletion kernel
    * generalized to updates: rows whose `keyCol` matches a batch key are
    * REPLACED by the batch row, unmatched batch rows are inserted, and
    * only affected partitions rewrite. Affected = partitions holding a
    * matching key (a key may MOVE partitions — its old row is retired
    * from wherever it lived) ∪ the batch rows' own partitions. The
    * affected-value list is driver-side metadata (the
    * identifyAffectedPartitions shape); the key retirement itself is a
    * distributed LEFT ANTI join, never an id IN-list, so a batch of any
    * size stays on the cluster.
    */
  def merge(batch: DataFrame, tableDir: String, partCol: String,
      keyCol: String): Unit = withCommitRetry {
    val spark = batch.sparkSession
    val v = latestVersion(spark, tableDir) + 1
    val m = readManifestFull(spark, tableDir, v - 1)
    val current = readView(spark, tableDir, m)
    val batchKeys = batch.select(keyCol).distinct()
    val affected = (
      current.join(batchKeys, keyCol).select(col(partCol).cast("string")) unionByName
      batch.select(col(partCol).cast("string"))
    ).distinct().collect().map(_.getString(0)).toSet
    val (hit, kept) = m.leaves.partition(l => affected.contains(leafPartValue(l)))
    val rewritten =
      (if (hit.isEmpty) batch
       else readView(spark, tableDir, m, onlyLeaves = Some(hit))
         .join(batchKeys, Seq(keyCol), "left_anti")
         .unionByName(batch))
    writeManifest(spark, tableDir, v,
      kept ++ writeDataDir(rewritten, tableDir, v, partCol),
      m.deletes, m.dirty.filter(kept.contains), m.txns)
  }

  /** CDC between two snapshots: full-outer join on `keyCol`, content
    * compared via a caller-supplied deterministic fingerprint column list
    * (stringable columns — no raw doubles: float formatting is engine-
    * specific, so quantize first). Returns one row per differing key with
    * status added/removed/changed, plus the unchanged keys if
    * `includeUnchanged`. The join is key-partitioned — O(|vA| + |vB|)
    * shuffle, carrying key + fingerprint only, never full rows.
    */
  def versionDiff(spark: SparkSession, tableDir: String, keyCol: String,
      fingerprintCols: Seq[String], fromV: Int, toV: Int,
      includeUnchanged: Boolean = false): DataFrame = {
    def fp(df: DataFrame) = df.select(col(keyCol),
      md5(concat_ws("|", fingerprintCols.map(col): _*)).as("fp"))
    val a = fp(readVersion(spark, tableDir, fromV)).withColumnRenamed("fp", "fp_from")
    val b = fp(readVersion(spark, tableDir, toV)).withColumnRenamed("fp", "fp_to")
    val joined = a.join(b, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("fp_from").isNull, "added")
          .when(col("fp_to").isNull, "removed")
          .when(col("fp_from") =!= col("fp_to"), "changed")
          .otherwise("unchanged").as("status"))
    if (includeUnchanged) joined else joined.filter(col("status") =!= "unchanged")
  }

  /** Version history as a frame — the DESCRIBE HISTORY surface: one row
    * per retained version with its manifest-level footprint. Pure
    * driver-side metadata (manifest parses), no data scan; with
    * `includeRowCounts` each version additionally pays one vector-applied
    * count job (an audit tool, not a dashboard default).
    */
  def history(spark: SparkSession, tableDir: String,
      includeRowCounts: Boolean = false): DataFrame = {
    import spark.implicits._
    versions(spark, tableDir).map { v =>
      val m = readManifestFull(spark, tableDir, v)
      val rows =
        if (includeRowCounts) readView(spark, tableDir, m).count() else -1L
      (v, m.leaves.size.toLong, m.deletes.size.toLong, m.dirty.size.toLong,
        m.txns.size.toLong, rows)
    }.toDF("version", "n_leaves", "n_delete_vectors", "n_dirty_leaves",
      "n_txns", "n_rows")
  }

  /** RESTORE as a manifest pointer flip (the public Delta RESTORE shape,
    * roll-FORWARD style): commit a new version whose manifest is a copy
    * of `toVersion`'s — no data moves, history stays linear (the
    * abandoned versions remain time-travelable until [[vacuum]]), and the
    * commit goes through the same CAS as every other mutation. This is
    * what makes "the prior version IS the backup" real for the deletion
    * workflow: restore costs one manifest write, not a table copy.
    */
  def rollback(spark: SparkSession, tableDir: String, toVersion: Int): Unit =
    withCommitRetry {
      val m = readManifestFull(spark, tableDir, toVersion)
      val v = latestVersion(spark, tableDir) + 1
      writeManifest(spark, tableDir, v, m.leaves, m.deletes, m.dirty, m.txns)
    }

  /** Small-file maintenance: fold every live leaf into one fresh data dir
    * (one leaf per partition value again) as a new version — delete
    * vectors fold into the data here, so the new manifest carries none.
    * Prior versions keep referencing the old leaves until [[vacuum]].
    */
  def compact(spark: SparkSession, tableDir: String, partCol: String): Unit = {
    val v = latestVersion(spark, tableDir) + 1
    val m = readManifestFull(spark, tableDir, v - 1)
    val folded = readView(spark, tableDir, m)
    writeManifest(spark, tableDir, v,
      writeDataDir(folded, tableDir, v, partCol), txns = m.txns)
  }

  /** Drop all versions older than `retainLast` and physically delete every
    * leaf no retained manifest references — the erasure half of the
    * delete contract, and the metadata bound. Leaf set comparisons are
    * driver-side path lists (O(partitions + appends)).
    *
    * Also sweeps ORPHANS: `data/`/`deletes/` version dirs no manifest ever
    * committed (a crash between staging a data/vector dir and the manifest
    * rename leaves one). Only dirs whose version number is ≤ the latest
    * committed version are swept — an in-flight commit always targets
    * latest+1, so its staging is invisible to the sweep; like every
    * maintenance op here, vacuum itself must not run concurrently with a
    * writer (single-writer contract).
    */
  def vacuum(spark: SparkSession, tableDir: String, retainLast: Int): Unit = {
    require(retainLast >= 1, "must retain at least the latest version")
    val f = fs(spark, tableDir)
    val vs = versions(spark, tableDir)
    if (vs.isEmpty) return
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - retainLast))
    def refs(v: Int) = {
      val m = readManifestFull(spark, tableDir, v)
      m.leaves ++ m.deletes
    }
    val live = keep.flatMap(refs).toSet
    val dead = drop.flatMap(refs).toSet -- live
    // remove dead leaves first, manifests second: a crash in between
    // leaves old manifests pointing at missing leaves — unreadable, but
    // re-running vacuum completes; retained versions are never touched
    dead.toSeq.sorted.foreach(l => f.delete(new Path(s"$tableDir/$l"), true))
    drop.foreach(n =>
      f.delete(new Path(s"${manifestsDir(tableDir)}/v$n.json"), false))
    // orphan sweep: any versioned dir under data/ or deletes/ with no
    // retained reference underneath it and a version ≤ the committed head
    val latest = vs.last
    val verRe = "^(?:add|del)-v(\\d+)\\b.*".r
    for (root <- Seq("data", "deletes")) {
      val rp = new Path(s"$tableDir/$root")
      if (f.exists(rp)) f.listStatus(rp).foreach { st =>
        val name = st.getPath.getName
        val rel = s"$root/$name"
        name match {
          case verRe(n) if n.toInt <= latest &&
              !live.exists(l => l == rel || l.startsWith(rel + "/")) =>
            f.delete(st.getPath, true)
          case _ => ()
        }
      }
    }
  }

  /** Maintenance policy: compact only when some partition's leaf debt
    * (live leaves per partition value) exceeds `maxLeavesPerPartition`,
    * then vacuum to `retainLast`. The check is pure manifest metadata
    * (no data scan) — the cheap gate an ingestion scheduler calls after
    * every batch so small-file debt is bounded without paying a rewrite
    * per append. Returns true if a compaction ran.
    */
  def maintain(spark: SparkSession, tableDir: String, partCol: String,
      maxLeavesPerPartition: Int = 4, retainLast: Int = 2): Boolean = {
    require(maxLeavesPerPartition >= 1, "maxLeavesPerPartition must be >= 1")
    val m = readManifestFull(spark, tableDir, latestVersion(spark, tableDir))
    val worst =
      if (m.leaves.isEmpty) 0
      else m.leaves.groupBy(leafPartValue).values.map(_.size).max
    val ran = worst > maxLeavesPerPartition
    if (ran) compact(spark, tableDir, partCol)
    vacuum(spark, tableDir, retainLast)
    ran
  }

  // --------------------------- surface entry

  /** Deterministic version history over the events fixture: v0 = initial
    * load (event_id % 3 = 0), v1 = append of the rest, v2 = copy-on-write
    * delete of (event_type='click' AND user_id % 5 = 2). The query reads
    * ALL THREE snapshots after the delete and summarizes each — pinning
    * that history is preserved (v0/v1 still serve pre-delete states) AND
    * that the delete landed in v2, which is exactly what the DuckDB
    * oracle recomputes from the predicates.
    */
  def snapshotAsOf(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.pipeline.Stores
    val events = Tables.events(spark, sfDir)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
    val dir = Stores.temp("graft_vt")
    create(events.filter(col("event_id") % 3 === 0), dir, "pdate")
    append(events.filter(col("event_id") % 3 =!= 0), dir, "pdate")
    delete(spark, dir, "pdate",
      col("event_type") === "click" && col("user_id") % 5 === 2)
    val summaries = (0 to 2).map { v =>
      readVersion(spark, dir, v).agg(
        lit(v).as("version"),
        count(lit(1)).cast("long").as("n_rows"),
        sum(round(col("value") * 1e6).cast("long")).cast("long").as("sum_micros"),
        countDistinct(col("pdate")).cast("long").as("n_partitions"))
    }
    summaries.reduce(_ unionByName _)
      .select("version", "n_rows", "sum_micros", "n_partitions")
      .orderBy("version")
  }

  /** DESCRIBE HISTORY surface entry over the [[snapshotAsOf]] scenario
    * (create thirds → append rest → COW delete): the oracle recomputes
    * every version's LEAF COUNT from the slice predicates — v0 = distinct
    * partition values of the create slice, v1 adds the append slice's,
    * and v2 = unaffected leaves of both slices plus the affected
    * partitions that still have survivors — so the manifest bookkeeping
    * (carry-by-reference, per-partition rewrite, emptied-partition drop)
    * is hash-checked end-to-end by an independent engine, not just
    * spec-asserted.
    */
  def snapshotHistory(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.pipeline.Stores
    val events = Tables.events(spark, sfDir)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
    val dir = Stores.temp("graft_vt_hist")
    create(events.filter(col("event_id") % 3 === 0), dir, "pdate")
    append(events.filter(col("event_id") % 3 =!= 0), dir, "pdate")
    delete(spark, dir, "pdate",
      col("event_type") === "click" && col("user_id") % 5 === 2)
    history(spark, dir, includeRowCounts = true).orderBy("version")
  }

  def snapshotHistorySql(): String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |         strftime(ts, '%Y-%m-%d') AS pdate
      |  FROM events),
      |a AS (SELECT * FROM e WHERE event_id % 3 = 0),
      |b AS (SELECT * FROM e WHERE event_id % 3 <> 0),
      |aff AS (SELECT DISTINCT pdate FROM e
      |        WHERE event_type = 'click' AND user_id % 5 = 2)
      |SELECT 0 AS version,
      |  (SELECT CAST(count(DISTINCT pdate) AS BIGINT) FROM a) AS n_leaves,
      |  CAST(0 AS BIGINT) AS n_delete_vectors,
      |  CAST(0 AS BIGINT) AS n_dirty_leaves,
      |  CAST(0 AS BIGINT) AS n_txns,
      |  (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_rows
      |UNION ALL SELECT 1,
      |  (SELECT CAST(count(DISTINCT pdate) AS BIGINT) FROM a)
      |    + (SELECT CAST(count(DISTINCT pdate) AS BIGINT) FROM b),
      |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |  (SELECT CAST(count(*) AS BIGINT) FROM e)
      |UNION ALL SELECT 2,
      |  (SELECT CAST(count(DISTINCT pdate) AS BIGINT) FROM a
      |   WHERE pdate NOT IN (SELECT pdate FROM aff))
      |    + (SELECT CAST(count(DISTINCT pdate) AS BIGINT) FROM b
      |       WHERE pdate NOT IN (SELECT pdate FROM aff))
      |    + (SELECT CAST(count(DISTINCT pdate) AS BIGINT) FROM e
      |       WHERE NOT (event_type = 'click' AND user_id % 5 = 2)
      |         AND pdate IN (SELECT pdate FROM aff)),
      |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |  (SELECT CAST(count(*) AS BIGINT) FROM e
      |   WHERE NOT (event_type = 'click' AND user_id % 5 = 2))
      |ORDER BY version""".stripMargin

  /** Merge-on-read surface entry: v0 = full events load, v1/v2 = two
    * position-delete vectors (no data leaf rewritten — spec-pinned by
    * mtime), v3 = compact folding the vectors into data. The query
    * summarizes ALL FOUR snapshots, pinning time travel across vector
    * versions AND that the fold is a pure representation change (v3 ≡ v2
    * row-for-row, which the oracle states by repeating v2's predicates).
    */
  def snapshotDeleteMor(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.pipeline.Stores
    val events = Tables.events(spark, sfDir)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
    val dir = Stores.temp("graft_vt_mor")
    create(events, dir, "pdate")
    deleteMergeOnRead(spark, dir,
      col("event_type") === "view" && col("user_id") % 7 === 3)
    deleteMergeOnRead(spark, dir,
      col("event_type") === "click" && col("value") < 10.0)
    compact(spark, dir, "pdate")
    val summaries = (0 to 3).map { v =>
      readVersion(spark, dir, v).agg(
        lit(v).as("version"),
        count(lit(1)).cast("long").as("n_rows"),
        sum(round(col("value") * 1e6).cast("long")).cast("long").as("sum_micros"),
        countDistinct(col("pdate")).cast("long").as("n_partitions"))
    }
    summaries.reduce(_ unionByName _)
      .select("version", "n_rows", "sum_micros", "n_partitions")
      .orderBy("version")
  }

  def snapshotDeleteMorSql(): String =
    """WITH e AS (
      |  SELECT event_type, user_id, value,
      |         strftime(ts, '%Y-%m-%d') AS pdate
      |  FROM events),
      |v AS (
      |  SELECT 0 AS version, * FROM e
      |  UNION ALL
      |  SELECT 1, * FROM e
      |  WHERE NOT (event_type = 'view' AND user_id % 7 = 3)
      |  UNION ALL
      |  SELECT 2, * FROM e
      |  WHERE NOT (event_type = 'view' AND user_id % 7 = 3)
      |    AND NOT (event_type = 'click' AND value < 10.0)
      |  UNION ALL
      |  SELECT 3, * FROM e
      |  WHERE NOT (event_type = 'view' AND user_id % 7 = 3)
      |    AND NOT (event_type = 'click' AND value < 10.0))
      |SELECT version,
      |       count(*) AS n_rows,
      |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros,
      |       CAST(count(DISTINCT pdate) AS BIGINT) AS n_partitions
      |FROM v GROUP BY version ORDER BY version""".stripMargin

  /** Shared history for the merge/CDC entries: v0 = initial load
    * (event_id % 3 = 0, with values pre-quantized to micro-units in a
    * stored column), v1 = one MERGE carrying updates (event_id % 6 = 0,
    * value doubled) and inserts (event_id % 3 = 1).
    */
  private def buildMergeHistory(spark: SparkSession, sfDir: String): String = {
    import graft.pipeline.Stores
    val events = Tables.events(spark, sfDir)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("micros", round(col("value") * 1e6).cast("long"))
      .select("event_id", "user_id", "event_type", "value", "micros", "pdate")
    val dir = Stores.temp("graft_vt_merge")
    create(events.filter(col("event_id") % 3 === 0), dir, "pdate")
    val updates = events.filter(col("event_id") % 6 === 0)
      .withColumn("value", col("value") * 2)
      .withColumn("micros", round(col("value") * 1e6).cast("long"))
    val inserts = events.filter(col("event_id") % 3 === 1)
    merge(updates.unionByName(inserts), dir, "pdate", "event_id")
    dir
  }

  /** MERGE surface entry: per-type profile of the post-merge snapshot —
    * replaced rows count once with doubled values, inserts appear,
    * untouched rows carry over (all three pinned by the recompute oracle).
    */
  def snapshotMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = buildMergeHistory(spark, sfDir)
    readLatest(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("micros")).cast("long").as("sum_micros"))
      .orderBy("event_type")
  }

  def snapshotMergeSql(): String =
    """WITH v1 AS (
      |  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS micros
      |  FROM events WHERE event_id % 3 = 0 AND event_id % 6 <> 0
      |  UNION ALL
      |  SELECT event_type, CAST(round(value * 2 * 1000000) AS BIGINT)
      |  FROM events WHERE event_id % 6 = 0
      |  UNION ALL
      |  SELECT event_type, CAST(round(value * 1000000) AS BIGINT)
      |  FROM events WHERE event_id % 3 = 1)
      |SELECT event_type, count(*) AS n,
      |       CAST(sum(micros) AS BIGINT) AS sum_micros
      |FROM v1 GROUP BY 1 ORDER BY 1""".stripMargin

  /** CDC surface entry: status census of the v0 → v1 merge (added /
    * changed / unchanged; a doubled value that quantizes to the same
    * micro-unit — value 0 — counts unchanged, which the oracle mirrors).
    */
  def snapshotChanges(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = buildMergeHistory(spark, sfDir)
    versionDiff(spark, dir, "event_id",
        Seq("event_type", "user_id", "micros"), 0, 1, includeUnchanged = true)
      .groupBy("status").agg(count(lit(1)).cast("long").as("n"))
      .orderBy("status")
  }

  def snapshotChangesSql(): String =
    """WITH st AS (
      |  SELECT CASE
      |    WHEN event_id % 3 = 1 THEN 'added'
      |    WHEN event_id % 6 = 0
      |         AND CAST(round(value * 2 * 1000000) AS BIGINT)
      |          <> CAST(round(value * 1000000) AS BIGINT) THEN 'changed'
      |    ELSE 'unchanged' END AS status
      |  FROM events WHERE event_id % 3 IN (0, 1))
      |SELECT status, count(*) AS n FROM st GROUP BY 1 ORDER BY 1""".stripMargin

  def snapshotAsOfSql(): String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, value,
      |         strftime(ts, '%Y-%m-%d') AS pdate
      |  FROM events),
      |v AS (
      |  SELECT 0 AS version, * FROM e WHERE event_id % 3 = 0
      |  UNION ALL
      |  SELECT 1, * FROM e
      |  UNION ALL
      |  SELECT 2, * FROM e WHERE NOT (event_type = 'click' AND user_id % 5 = 2))
      |SELECT version,
      |       count(*) AS n_rows,
      |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros,
      |       CAST(count(DISTINCT pdate) AS BIGINT) AS n_partitions
      |FROM v GROUP BY version ORDER BY version""".stripMargin
}

package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructType}

import graft.sources.VersionedTable

/** The Delta-style maintenance STATEMENTS, by parser injection — the
  * exact spellings a Delta operator types, over the same locked library
  * calls the `CALL graft.…` procedures shim (both surfaces stay; typed
  * muscle memory should not need retraining):
  *
  * {{{
  *   VACUUM graft.`/warehouse/events` RETAIN 3 VERSIONS
  *   VACUUM graft.`/warehouse/events` RETAIN 3 VERSIONS DRY RUN
  *   VACUUM graft.`/warehouse/events` DRY RUN
  *   OPTIMIZE graft.`/warehouse/events`
  *   OPTIMIZE graft.`/warehouse/events` WHERE pdate >= '2026-01-01'
  *   OPTIMIZE graft.`/warehouse/events` ZORDER BY (user_id, event_id)
  *   OPTIMIZE graft.`/warehouse/events` WHERE pdate = '2026-01-01'
  *     ZORDER BY (user_id, event_id, ts)
  *   DESCRIBE HISTORY graft.`/warehouse/events`
  *   DESCRIBE DETAIL graft.`/warehouse/events`
  *   RESTORE TABLE graft.`/warehouse/events` TO VERSION AS OF 2
  *   CREATE TABLE graft.`/scratch/events_dev` SHALLOW CLONE
  *     graft.`/warehouse/events`
  * }}}
  *
  * Every statement takes either spelling of the identifier — backquoted
  * path or `graft.db.t` named parts (resolved under the warehouse root
  * at run time).
  *
  * The interceptor matches ONLY these fixed shapes (anchored regexes
  * over a backquoted `graft.`…`` identifier); every other statement —
  * including malformed variants of these — falls through verbatim to
  * Spark's own parser, so the error a user sees for `VACUUM t` (no
  * graft identifier) is Spark's, not a misleading graft one.
  * `VACUUM` without RETAIN refuses rather than guessing a default:
  * history is the product, and how much of it to erase is the one
  * decision the statement must not make silently. `OPTIMIZE` without
  * ZORDER is [[VersionedTable.binpack]] at a 32 MiB floor.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    intercept(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

private[plans] object GraftSqlParser {

  // graft.`/abs/path` (backquoted path table) or graft.db.t (named
  // table, 2+ dotted parts, resolved under the warehouse root at run
  // time); the catalog name is literal (the conventional registration).
  // The capture keeps the backquotes so the command can tell the two
  // spellings apart.
  private val Table = "graft\\.(`[^`]+`|\\w+(?:\\.\\w+)+)"
  private val VacuumDryRetain =
    ("(?is)\\s*VACUUM\\s+" + Table +
      "\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s+DRY\\s+RUN\\s*;?\\s*").r
  private val Vacuum =
    ("(?is)\\s*VACUUM\\s+" + Table +
      "\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*;?\\s*").r
  private val VacuumDry =
    ("(?is)\\s*VACUUM\\s+" + Table + "\\s+DRY\\s+RUN\\s*;?\\s*").r
  private val VacuumBare =
    ("(?is)\\s*VACUUM\\s+" + Table + "\\s*;?\\s*").r
  // OPTIMIZE t [WHERE <partition predicate>] [ZORDER BY (c1[, …])] —
  // one shape, both clauses optional (Delta's statement); the column
  // list is any arity (1–7 enforced by the layout writer, loudly)
  private val Optimize =
    ("(?is)\\s*OPTIMIZE\\s+" + Table +
      "(?:\\s+WHERE\\s+(.+?))?" +
      "(?:\\s+ZORDER\\s+BY\\s*\\(\\s*(\\w+(?:\\s*,\\s*\\w+)*)\\s*\\))?" +
      "\\s*;?\\s*").r
  private val History =
    ("(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+" + Table + "\\s*;?\\s*").r
  private val Detail =
    ("(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+" + Table + "\\s*;?\\s*").r
  private val Restore =
    ("(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?" + Table +
      "\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*").r
  // Delta's second RESTORE spelling: the version is resolved from the
  // timestamp at RUN time (latest manifest committed at or before it)
  private val RestoreTs =
    ("(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?" + Table +
      "\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*").r
  // CREATE TABLE dst SHALLOW CLONE src — Delta's zero-copy branch; the
  // library call hard-links live leaves (same-volume) and starts the
  // clone's own history at v0
  private val ShallowClone =
    ("(?is)\\s*CREATE\\s+TABLE\\s+" + Table +
      "\\s+SHALLOW\\s+CLONE\\s+" + Table + "\\s*;?\\s*").r
  // loud refusals for RECOGNIZED-but-malformed graft maintenance
  // statements (advice: an `OPTIMIZE graft.`t` ZORDER BY c` without
  // parens must not surface an unrelated Spark ParseException); the
  // guards match only a graft identifier after the verb, so non-graft
  // statements still fall through verbatim
  // OPTIMIZE/VACUUM are not Spark statements at all, so intercepting
  // every graft-prefixed spelling (path or named) is safe
  private val OptimizeGuard = "(?is)\\s*OPTIMIZE\\s+graft\\..*".r
  private val VacuumGuard = "(?is)\\s*VACUUM\\s+graft\\..*".r

  def intercept(sqlText: String): Option[LogicalPlan] = sqlText match {
    case VacuumDryRetain(dir, n) =>
      Some(GraftVacuumDryRunCommand(dir, n.toInt))
    case Vacuum(dir, n) => Some(GraftVacuumCommand(dir, n.toInt))
    case VacuumDry(dir) => Some(GraftVacuumDryRunCommand(dir))
    case VacuumBare(dir) => throw new UnsupportedOperationException(
      s"VACUUM graft.`${dir.stripPrefix("`").stripSuffix("`")}` needs " +
        "an explicit retention — " +
        "`RETAIN <n> VERSIONS` (or `DRY RUN` to preview): versions are " +
        "the product, and how much history to erase is the one decision " +
        "this statement must not make silently")
    case Optimize(dir, whereOrNull, zcolsOrNull) =>
      val where = Option(whereOrNull).map(_.trim).filter(_.nonEmpty)
      val zcols =
        Option(zcolsOrNull).map(_.split(",").map(_.trim).toSeq)
      Some(GraftOptimizeCommand(dir, zcols, where))
    case History(dir) => Some(GraftDescribeHistoryCommand(dir))
    case Detail(dir) => Some(GraftDescribeDetailCommand(dir))
    case Restore(dir, v) => Some(GraftRestoreCommand(dir, v.toInt))
    case RestoreTs(dir, ts) => Some(GraftRestoreTimestampCommand(dir, ts))
    case ShallowClone(dst, src) => Some(GraftShallowCloneCommand(dst, src))
    case OptimizeGuard() => throw new UnsupportedOperationException(
      "malformed OPTIMIZE on a graft table — supported: OPTIMIZE " +
        "graft.`dir` [WHERE <partition predicate>] " +
        "[ZORDER BY (c1[, c2, …])] (ZORDER columns need parentheses)")
    case VacuumGuard() => throw new UnsupportedOperationException(
      "malformed VACUUM on a graft table — supported: VACUUM " +
        "graft.`dir` RETAIN <n> VERSIONS [DRY RUN] | VACUUM " +
        "graft.`dir` DRY RUN")
    case _ => None
  }

  /** The table's recorded spec — the same manifest-is-the-authority
    * resolution the procedures use.
    */
  def specOf(spark: SparkSession, dir: String): String =
    VersionedTable.recordedSpec(spark, dir).getOrElse(
      throw new UnsupportedOperationException(
        s"table $dir has no recorded partition spec (legacy manifest) — " +
          "maintenance statements need one; run any append to record it"))

  /** Resolve a statement's table spelling at RUN time: backquoted = the
    * directory itself; dotted = named parts under the warehouse root
    * (the [[graft.sources.GraftCatalog]] resolution, re-expressed on
    * the parser surface so `OPTIMIZE graft.db.t` means the same
    * directory as `SELECT … FROM graft.db.t`).
    */
  def resolveDir(spark: SparkSession, ident: String): String =
    if (ident.startsWith("`")) ident.substring(1, ident.length - 1)
    else spark.conf
      .getOption("spark.sql.catalog.graft.warehouse") match {
      case Some(root) =>
        (root.stripSuffix("/") +: ident.split('.').toSeq).mkString("/")
      case None => throw new UnsupportedOperationException(
        s"named graft table '$ident' needs a warehouse root — set " +
          "spark.sql.catalog.graft.warehouse (or use the backquoted " +
          "path spelling)")
    }
}

/** `VACUUM graft.`dir` RETAIN n VERSIONS` → [[VersionedTable.vacuum]]. */
case class GraftVacuumCommand(tableDir: String, retainLast: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("versions_dropped", LongType, nullable = false)(),
    AttributeReference("versions_retained", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.resolveDir(spark, tableDir)
    val before = VersionedTable.versions(spark, dir)
    VersionedTable.vacuum(spark, dir, retainLast)
    val after = VersionedTable.versions(spark, dir)
    Seq(Row(dir, (before.size - after.size).toLong, after.size.toLong))
  }
}

/** `VACUUM graft.`dir` [RETAIN n VERSIONS] DRY RUN` →
  * [[VersionedTable.vacuumDryRun]]; without RETAIN the minimum legal
  * retention (1) previews the widest erasable set. ONE summary row
  * (the `CALL graft.vacuum_dry_run` shape): dead paths die only when
  * ALL their referencing dropped versions drop, so a per-version
  * count would be attribution fiction.
  */
case class GraftVacuumDryRunCommand(tableDir: String, retainLast: Int = 1)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("would_drop_versions", StringType,
      nullable = false)(),
    AttributeReference("n_would_drop_versions", LongType,
      nullable = false)(),
    AttributeReference("n_dead_paths", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.resolveDir(spark, tableDir)
    val (dead, drop, _) =
      VersionedTable.vacuumDryRun(spark, dir, retainLast)
    Seq(Row(dir, drop.mkString(","), drop.size.toLong,
      dead.size.toLong))
  }
}

/** `OPTIMIZE graft.`dir` [WHERE <pred>] [ZORDER BY (c1[, …])]` →
  * [[VersionedTable.optimizeZOrderCols]] / [[VersionedTable.binpack]]
  * (at a 32 MiB leaf floor — the small-file compaction an operator
  * means by bare OPTIMIZE). `WHERE` is a PARTITION-column predicate
  * scoping which leaves re-lay-out (Delta's incremental-maintenance
  * shape — at 100 TB re-layout happens slice by slice); out-of-slice
  * leaves carry by reference, byte-untouched.
  */
case class GraftOptimizeCommand(tableDir: String,
    zorder: Option[Seq[String]], where: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.resolveDir(spark, tableDir)
    val spec = GraftSqlParser.specOf(spark, dir)
    val op = zorder match {
      case Some(cs) =>
        VersionedTable.optimizeZOrderCols(spark, dir, spec, cs,
          where = where)
        s"zorder(${cs.mkString(",")})"
      case None =>
        VersionedTable.binpack(spark, dir, spec, 32L << 20, where)
        "binpack"
    }
    Seq(Row(dir, op, VersionedTable.latestVersion(spark, dir)))
  }
}

/** `DESCRIBE HISTORY graft.`dir`` — one row per retained version, the
  * same frame as the `.history` metadata table (manifest parses only).
  */
case class GraftDescribeHistoryCommand(tableDir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_leaves", LongType, nullable = false)(),
    AttributeReference("n_delete_vectors", LongType, nullable = false)(),
    AttributeReference("n_dirty_leaves", LongType, nullable = false)(),
    AttributeReference("n_txns", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    VersionedTable.history(spark,
      GraftSqlParser.resolveDir(spark, tableDir)).collect().toSeq
}

/** `DESCRIBE DETAIL graft.`dir`` — the head's physical footprint, the
  * same frame as the `.detail` metadata table.
  */
case class GraftDescribeDetailCommand(tableDir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("num_versions", IntegerType, nullable = false)(),
    AttributeReference("num_leaves", IntegerType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_delete_dirs", IntegerType, nullable = false)(),
    AttributeReference("num_dirty_leaves", IntegerType,
      nullable = false)(),
    AttributeReference("partition_spec", StringType, nullable = false)(),
    AttributeReference("schema_ddl", StringType, nullable = false)(),
    AttributeReference("num_txn_channels", IntegerType,
      nullable = false)(),
    AttributeReference("num_constraints", IntegerType, nullable = false)(),
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("row_tracking", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    VersionedTable.describeDetail(spark,
      GraftSqlParser.resolveDir(spark, tableDir)).collect().toSeq
}

/** `CREATE TABLE graft.`dst` SHALLOW CLONE graft.`src`` — Delta's
  * zero-copy branch as a statement ([[VersionedTable.cloneTable]]):
  * the clone's v0 references the source head's live leaves by hard
  * link (same volume; copies across volumes), histories diverge from
  * there, and either side's vacuum can never reclaim the other's bytes
  * (each manifest owns its own links).
  */
case class GraftShallowCloneCommand(dstTable: String, srcTable: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("source", StringType, nullable = false)(),
    AttributeReference("destination", StringType, nullable = false)(),
    AttributeReference("files_linked", LongType, nullable = false)(),
    AttributeReference("files_copied", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftSqlParser.resolveDir(spark, srcTable)
    val dst = GraftSqlParser.resolveDir(spark, dstTable)
    val (linked, copied) = VersionedTable.cloneTable(spark, src, dst)
    Seq(Row(src, dst, linked, copied))
  }
}

/** `RESTORE [TABLE] graft.`dir` TO VERSION AS OF n` — Delta's RESTORE
  * as the manifest pointer flip ([[VersionedTable.rollback]]): a new
  * version whose manifest copies the target's, no data moves, history
  * stays linear.
  */
case class GraftRestoreCommand(tableDir: String, toVersion: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("restored_from", IntegerType, nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.resolveDir(spark, tableDir)
    VersionedTable.rollback(spark, dir, toVersion)
    Seq(Row(dir, toVersion,
      VersionedTable.latestVersion(spark, dir)))
  }
}

/** `RESTORE [TABLE] graft.`dir` TO TIMESTAMP AS OF '<ts>'` — the same
  * pointer flip with the version resolved from the timestamp at run
  * time (epoch millis or UTC `yyyy-MM-dd HH:mm:ss`, the shared
  * [[graft.sources.SnapshotConnector.versionAtSpec]] authority; a
  * pre-table instant refuses loudly, never restores to nothing).
  */
case class GraftRestoreTimestampCommand(tableDir: String, ts: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("restored_from", IntegerType, nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.resolveDir(spark, tableDir)
    val v = graft.sources.SnapshotConnector.versionAtTimestamp(
      spark, dir, ts)
    VersionedTable.rollback(spark, dir, v)
    Seq(Row(dir, v, VersionedTable.latestVersion(spark, dir)))
  }
}

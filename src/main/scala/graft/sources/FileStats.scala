package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Per-FILE column min/max/null stats for the versioned table — the
  * public Delta/Iceberg data-skipping design re-expressed minimally:
  * stats live NEXT TO the commit that wrote the files (`_stats.tsv` in
  * each `add-v<N>` dir), so the planner skips whole files on arbitrary
  * column predicates without opening a single footer at query time.
  *
  * Harvest cost sits on the WRITE path and is metadata-sized: one
  * driver-side parquet footer read per new file in the batch (the
  * footer already holds per-row-group min/max/nulls; this folds them to
  * file granularity) — never a data scan, never per-query work. At
  * 100 TB the alternative — reading every live file's footer per query
  * — is exactly the LIST/footer storm the lakehouse log designs exist
  * to avoid.
  *
  * Only types whose parquet statistics order matches Spark's are
  * recorded (integral, float/double, boolean, UTF8 string — parquet's
  * unsigned-lexicographic binary order equals UTF8String's byte order);
  * date/timestamp/decimal are deliberately left out rather than decoded
  * approximately. Values serialize base64(UTF-8 of toString), dodging
  * every escaping pitfall a hand-rolled format could hit; absent stats
  * simply mean "no skipping" — conservative by construction.
  */
object FileStats {

  val StatsFileName = "_stats.tsv"

  /** File-level manifest sidecar (`_files.tsv` in each add-dir): one
    * line per data file, `relFile size mtimeMs`. What lets
    * [[graft.sources.ManifestFileIndex]] construct a snapshot's file
    * list from metadata alone — ZERO per-leaf `listStatus` calls on the
    * read path. At a million-file table the alternative is a million
    * NameNode RPCs per relation build; recording names+sizes in the
    * commit is exactly why the Delta log carries `add` actions with
    * `path`+`size`.
    */
  val FileListName = "_files.tsv"

  /** Row-tracking sidecar (`_rowids.tsv` in each add-dir of a
    * row-tracked table): one line per data file —
    * `relFile kind value rows`. Kind `b` records the file's BASE row id
    * (fresh-append leaves carry no id column; a row's id derives at
    * read time as `base + _metadata.row_index` — the Delta row-tracking
    * "fresh rows" design, public spec), kind `m` marks a file whose
    * rows carry a MATERIALIZED physical id column (COW rewrites), with
    * `value` the file's max id. The table's id high-watermark and the
    * read path's base lookup both resolve from this one sidecar;
    * immutable with its add-dir like every other sidecar.
    */
  val RowIdFileName = "_rowids.tsv"

  final case class RowIdEntry(rel: String, kind: String, value: Long,
      rows: Long) {
    /** First id at or above every id this file can hold. */
    def idCeiling: Long = if (kind == "b") value + rows else value + 1
  }

  def writeRowIds(fsys: FileSystem, dataDirAbs: Path,
      entries: Seq[RowIdEntry]): Unit = {
    val body = entries.sortBy(_.rel)
      .map(e => s"${e.rel}\t${e.kind}\t${e.value}\t${e.rows}")
      .mkString("\n") + "\n"
    val out = fsys.create(new Path(dataDirAbs, RowIdFileName), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** None = the add-dir predates row tracking (pre-enable leaves read
    * null ids; the enable path backfills live roots so this stays a
    * time-travel-only case).
    */
  def loadRowIds(fsys: FileSystem, dataDirAbs: Path,
      lenient: Boolean = false): Option[Seq[RowIdEntry]] = {
    val p = new Path(dataDirAbs, RowIdFileName)
    try {
      if (!fsys.exists(p)) None
      else {
        val in = fsys.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        Some(text.split('\n').toSeq.filter(_.nonEmpty).flatMap { line =>
          line.split('\t') match {
            case Array(rel, kind, value, rows) =>
              Some(RowIdEntry(rel, kind, value.toLong, rows.toLong))
            case _ if lenient =>
              // watermark scans race CONCURRENT writers' in-flight
              // sidecars: a truncated tail line means the dir is
              // mid-publish and uncommitted — under-counting it is
              // safe (the CAS forces the loser to re-derive over the
              // completed file)
              None
            case _ => throw new IllegalStateException(
              s"malformed $RowIdFileName line: '$line'")
          }
        })
      }
    } catch {
      // mid-write/mid-vacuum races (file vanished, checksum shorter
      // than the data): lenient readers treat the dir as not-yet-
      // published; strict readers (committed-leaf resolution) propagate
      case e: java.io.IOException if lenient => None
    }
  }

  /** Exact per-file row counts from parquet FOOTERS alone — one
    * metadata read per file, no data scan, independent of which column
    * TYPES are stats-recordable (row-id base assignment must work even
    * for a table of all-unsupported column types). Parquet-only by
    * design: row tracking requires `_metadata.row_index`, which Spark
    * exposes for parquet only.
    */
  def parquetRowCounts(conf: org.apache.hadoop.conf.Configuration,
      dataDirAbs: Path, rels: Seq[String]): Map[String, Long] =
    graft.core.Par.run(rels.map { rel => () =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(dataDirAbs, rel), conf))
      try rel -> reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally reader.close()
    }).toMap

  /** One column's file-level stats. `min`/`max` are None when the column
    * is all-null in the file (or the footer carried no stats). `nulls` is
    * None when the footer did NOT record a null count — "unknown" must
    * never collapse to 0, or absent statistics would become positive
    * evidence (IS NULL skipping would drop a file that might hold nulls,
    * and count(col) = rows − nulls would over-count).
    */
  final case class ColStats(min: Option[String], max: Option[String],
      nulls: Option[Long], rows: Long) {
    /** Proven all-null: requires a KNOWN null count covering every row. */
    def allNull: Boolean = nulls.exists(_ >= rows)
    /** Proven null-free: requires a KNOWN zero null count. */
    def noNulls: Boolean = nulls.contains(0L)
  }

  /** Spark types whose stats we trust (see Scaladoc). */
  private[graft] def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | BooleanType | StringType => true
    case _ => false
  }

  /** Types whose footer min/max can prove anything: float/double are
    * excluded everywhere a min/max PROOF is consumed (file skipping,
    * metadata extrema, bounds) — Spark orders NaN above every double
    * while parquet writers variously omit or mis-order NaN in footer
    * stats, so a float extremum from stats could silently disagree with
    * a scan. Counts/nulls stay usable for every supported type.
    */
  private[graft] def minMaxSafe(dt: DataType): Boolean =
    supported(dt) && dt != FloatType && dt != DoubleType

  /** Order two RENDERED stat values under `dt`'s comparator — the one
    * comparison rule every stats consumer (bounds queries, file
    * skipping, the metadata-aggregate rewrite) must share: numerics by
    * value, strings in unsigned UTF-8 byte order (parquet's comparator =
    * Spark's UTF8String order = DuckDB's binary collation).
    */
  def statLess(a: String, b: String, dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => a.toDouble < b.toDouble
    case BooleanType => !a.toBoolean && b.toBoolean
    case StringType =>
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
    case _ => a.toLong < b.toLong
  }

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** Fold one file's footer into (col -> stats). Row groups merge by
    * min-of-mins / max-of-maxes on the DECODED values.
    */
  private def footerStats(conf: org.apache.hadoop.conf.Configuration,
      file: Path, wanted: Map[String, DataType]): Map[String, ColStats] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val perCol = scala.collection.mutable.Map[String,
        (Option[Any], Option[Any], Option[Long], Long, Boolean)]()
      for (block <- blocks; col <- block.getColumns.asScala) {
        val name = col.getPath.toDotString
        if (wanted.contains(name)) {
          val rows = block.getRowCount
          val st = col.getStatistics
          // absent stats stay UNKNOWN (None), never 0: a row group whose
          // footer lacks stats (or a null count) makes the whole file's
          // null count unknowable
          val (mn, mx, nulls) =
            if (st == null || st.isEmpty) (None, None, None)
            else {
              val n = if (st.isNumNullsSet) Some(st.getNumNulls) else None
              if (st.hasNonNullValue)
                (Option(st.genericGetMin), Option(st.genericGetMax), n)
              else (None, None, n)
            }
          val statsAbsent = st == null || st.isEmpty
          // a row group without usable min/max poisons the file's min/max:
          // stats fully absent, OR stats present with no recorded value
          // while the group is not provably all-null (parquet-mr omits
          // oversized >4KB binary min/max but keeps null_count — those
          // rows hold values outside the other groups' recorded range)
          val valuesUnbounded = !statsAbsent && !st.hasNonNullValue &&
            !nulls.contains(rows)
          val (pmn, pmx, pn, pr, seen) =
            perCol.getOrElse(name,
              (None, None, Some(0L): Option[Long], 0L, false))
          val mergedNulls =
            for (a <- pn; b <- nulls) yield a + b
          perCol(name) =
            if (statsAbsent || valuesUnbounded || seen)
              (None, None, mergedNulls, pr + rows, true)
            else (mergeMin(pmn, mn), mergeMax(pmx, mx), mergedNulls,
              pr + rows, false)
        }
      }
      perCol.toMap.map { case (name, (mn, mx, nulls, rows, _)) =>
        name -> ColStats(mn.map(render), mx.map(render), nulls, rows)
      }
    } finally reader.close()
  }

  private def render(v: Any): String = v match {
    case b: Binary => b.toStringUsingUTF8
    case other => other.toString
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Binary, y: Binary) => x.compareTo(y) // unsigned lexicographic
    case (x: java.lang.Number, y: java.lang.Number)
        if a.isInstanceOf[java.lang.Float] || a.isInstanceOf[java.lang.Double] =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: java.lang.Number, y: java.lang.Number) =>
      java.lang.Long.compare(x.longValue(), y.longValue())
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
    case _ => 0
  }

  private def mergeMin(a: Option[Any], b: Option[Any]): Option[Any] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(if (cmp(x, y) <= 0) x else y)
      case _ => a.orElse(b)
    }

  private def mergeMax(a: Option[Any], b: Option[Any]): Option[Any] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(if (cmp(x, y) >= 0) x else y)
      case _ => a.orElse(b)
    }

  /** A data file of either supported format — the one extension test
    * every consumer (file lists, byte sums, index builds) shares.
    */
  def isDataFile(name: String): Boolean =
    name.endsWith(".parquet") || name.endsWith(".orc")

  /** Fold one ORC file's FILE-LEVEL statistics into (col -> stats) —
    * the ORC sibling of [[footerStats]]. ORC readers expose file-level
    * ColumnStatistics directly (no row-group fold needed); null counts
    * derive from `rows − getNumberOfValues` (ORC counts non-null
    * values), and min/max are taken only where the reader yields
    * untruncated typed extrema (integral + string; a truncated or
    * absent extremum stays None — consumers already treat
    * "values present, bounds unknown" as a refusal).
    */
  private def orcStats(conf: org.apache.hadoop.conf.Configuration,
      file: Path, wanted: Map[String, DataType]): Map[String, ColStats] = {
    val reader = org.apache.orc.OrcFile.createReader(file,
      org.apache.orc.OrcFile.readerOptions(conf))
    try {
      val rows = reader.getNumberOfRows
      val stats = reader.getStatistics
      val schema = reader.getSchema
      val names = schema.getFieldNames.asScala.toSeq
      val kids = schema.getChildren.asScala.toSeq
      names.zip(kids).collect {
        case (name, td) if wanted.contains(name) =>
          val cs = stats(td.getId)
          val nulls = Some(rows - cs.getNumberOfValues)
          val (mn, mx) = cs match {
            case s: org.apache.orc.IntegerColumnStatistics
                if cs.getNumberOfValues > 0 =>
              (Some(s.getMinimum.toString), Some(s.getMaximum.toString))
            case s: org.apache.orc.StringColumnStatistics
                if cs.getNumberOfValues > 0 &&
                  s.getMinimum != null && s.getMaximum != null =>
              (Some(s.getMinimum), Some(s.getMaximum))
            case _ => (None, None) // float/double/bool/truncated: no proof
          }
          name -> ColStats(mn, mx, nulls, rows)
      }.toMap
    } finally reader.close()
  }

  /** Harvest stats for every data file under `dataDirAbs` (recursing
    * into the hive leaf dirs) and write `_stats.tsv` at its root. Called
    * by [[VersionedTable]] right after each data-dir write; `schema` is
    * the batch's, deciding which columns are recorded; `fmt` picks the
    * footer harvester (parquet row-group fold vs ORC file statistics).
    *
    * Line format (tab-separated, one line per file×column):
    * `relFile col rows nulls minB64 maxB64` with `-` for absent values.
    */
  def write(spark: SparkSession, dataDirAbs: String,
      schema: StructType, fmt: String = "parquet"): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dataDirAbs)
    val f = root.getFileSystem(conf)
    val rootAbs = f.makeQualified(root).toUri.getPath
    // recursive walk: multi-column partition specs nest leaf dirs, so
    // data files can sit at any depth under the add-dir; `rel` is the
    // full root-relative path either way
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      f.listStatus(p).toSeq.flatMap {
        case st if st.isDirectory => walk(st.getPath)
        case st if st.isFile && isDataFile(st.getPath.getName) => Seq(st)
        case _ => Nil
      }
    val files = f.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(d => walk(d.getPath))
    def relOf(st: org.apache.hadoop.fs.FileStatus): String =
      f.makeQualified(st.getPath).toUri.getPath.stripPrefix(rootAbs + "/")
    // the file-level manifest rides every commit regardless of schema —
    // the read path's zero-listing construction must never depend on
    // which column types were stats-recordable
    val fileLines = files.map { st =>
      s"${relOf(st)}\t${st.getLen}\t${st.getModificationTime}"
    }.sorted
    val fout = f.create(new Path(root, FileListName), true)
    try fout.write((fileLines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally fout.close()
    val wanted = schema.fields.filter(fl => supported(fl.dataType))
      .map(fl => fl.name -> fl.dataType).toMap
    if (wanted.isEmpty) return
    // footer reads are independent per file and I/O-bound — harvested
    // from a driver thread pool (order restored by Par.run's input-order
    // results); this runs on EVERY commit, so at a 30-leaf batch the
    // sequential walk was 30 round-trips of pure latency
    val lines = graft.core.Par.run(files.map { st => () =>
      val rel = relOf(st)
      val perCol =
        if (fmt == "orc") orcStats(conf, st.getPath, wanted)
        else footerStats(conf, st.getPath, wanted)
      perCol.toSeq.sortBy(_._1).map {
        case (col, cs) =>
          Seq(rel, col, cs.rows.toString,
            cs.nulls.map(_.toString).getOrElse("-"),
            cs.min.map(b64).getOrElse("-"), cs.max.map(b64).getOrElse("-"))
            .mkString("\t")
      }
    }).flatten
    val out = f.create(new Path(root, StatsFileName), true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Load one add-dir's file-level manifest: relFile -> (size, mtimeMs),
    * or None when the sidecar is absent (legacy add-dir — the reader
    * falls back to listing that dir's leaves).
    */
  def loadFileList(fsys: FileSystem,
      dataDirAbs: Path): Option[Map[String, (Long, Long)]] = {
    val p = new Path(dataDirAbs, FileListName)
    if (!fsys.exists(p)) None
    else {
      val in = fsys.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some(text.split('\n').toSeq.filter(_.nonEmpty).flatMap { line =>
        line.split('\t') match {
          case Array(rel, size, mtime) =>
            Some(rel -> ((size.toLong, mtime.toLong)))
          case _ => None
        }
      }.toMap)
    }
  }

  /** One table-wide CHECKPOINT body: every sidecar-covered add-root's
    * `_files.tsv` + `_stats.tsv` folded into a single text blob, so a
    * relation build reads ONE file instead of two sidecars per commit —
    * the Delta checkpoint-parquet / Iceberg manifest-list idea in the
    * house TSV dialect. Content per covered root reproduces the sidecar
    * maps byte-for-equal (same base64 value encoding, same "unknown"
    * dashes), which is what lets the reader treat checkpoint hits and
    * sidecar reads as the same evidence. Legacy roots (no `_files.tsv`)
    * are simply not covered — the reader keeps their listing path.
    *
    * Line grammar (tab-separated):
    * {{{
    * V <version>
    * R <root>                                    root is checkpoint-covered
    * F <root> <rel> <size> <mtimeMs>             one per data file
    * S <root> <rel> <col> <rows> <nulls> <minB64> <maxB64>
    * }}}
    * Returns None when no root is covered (nothing to checkpoint).
    */
  def checkpointBody(fsys: FileSystem, tableDir: String, version: Int,
      roots: Seq[String]): Option[String] = {
    val sb = new StringBuilder
    sb.append(s"V\t$version\n")
    var covered = 0
    roots.sorted.foreach { root =>
      loadFileList(fsys, new Path(s"$tableDir/$root")).foreach { files =>
        covered += 1
        sb.append(s"R\t$root\n")
        files.toSeq.sortBy(_._1).foreach { case (rel, (size, mtime)) =>
          sb.append(s"F\t$root\t$rel\t$size\t$mtime\n")
        }
        load(fsys, new Path(s"$tableDir/$root")).toSeq.sortBy(_._1)
          .foreach { case (rel, cols) =>
            cols.toSeq.sortBy(_._1).foreach { case (cname, cs) =>
              sb.append(Seq("S", root, rel, cname, cs.rows.toString,
                cs.nulls.map(_.toString).getOrElse("-"),
                cs.min.map(b64).getOrElse("-"),
                cs.max.map(b64).getOrElse("-")).mkString("\t"))
              sb.append('\n')
            }
          }
      }
    }
    if (covered == 0) None else Some(sb.toString)
  }

  /** Parsed checkpoint: (version, root -> fileList, root -> statsMap).
    * Covered roots are exactly `fileLists.keySet`; a covered root absent
    * from the stats map had no `_stats.tsv` (= empty stats, no skipping)
    * — identical semantics to reading the sidecars directly.
    */
  def parseCheckpoint(text: String): (Int, Map[String, Map[String, (Long, Long)]],
      Map[String, Map[String, Map[String, ColStats]]]) = {
    var version = -1
    val files = scala.collection.mutable.Map[String,
      scala.collection.mutable.Map[String, (Long, Long)]]()
    val stats = scala.collection.mutable.Map[String,
      scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, ColStats]]]()
    text.split('\n').iterator.filter(_.nonEmpty).foreach { line =>
      line.split('\t') match {
        case Array("V", v) => version = v.toInt
        case Array("R", root) =>
          files.getOrElseUpdate(root, scala.collection.mutable.Map.empty)
        case Array("F", root, rel, size, mtime) =>
          files.getOrElseUpdate(root, scala.collection.mutable.Map.empty)
            .update(rel, (size.toLong, mtime.toLong))
        case Array("S", root, rel, cname, rows, nulls, mn, mx) =>
          stats.getOrElseUpdate(root, scala.collection.mutable.Map.empty)
            .getOrElseUpdate(rel, scala.collection.mutable.Map.empty)
            .update(cname, ColStats(
              if (mn == "-") None else Some(unb64(mn)),
              if (mx == "-") None else Some(unb64(mx)),
              if (nulls == "-") None else Some(nulls.toLong), rows.toLong))
        case _ => // tolerate unknown line kinds (forward compatibility)
      }
    }
    (version,
      files.iterator.map { case (k, v) => k -> v.toMap }.toMap,
      stats.iterator.map { case (k, v) =>
        k -> v.iterator.map { case (r, c) => r -> c.toMap }.toMap
      }.toMap)
  }

  /** Load one add-dir's stats: relFile -> (col -> stats). Absent or
    * unreadable sidecar = empty map = no skipping for those files.
    */
  def load(fsys: FileSystem,
      dataDirAbs: Path): Map[String, Map[String, ColStats]] = {
    val p = new Path(dataDirAbs, StatsFileName)
    if (!fsys.exists(p)) Map.empty
    else {
      val in = fsys.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      text.split('\n').toSeq.filter(_.nonEmpty).flatMap { line =>
        line.split('\t') match {
          case Array(rel, col, rows, nulls, mn, mx) =>
            Some((rel, col, ColStats(
              if (mn == "-") None else Some(unb64(mn)),
              if (mx == "-") None else Some(unb64(mx)),
              if (nulls == "-") None else Some(nulls.toLong), rows.toLong)))
          case _ => None
        }
      }.groupBy(_._1).map { case (rel, rowsFor) =>
        rel -> rowsFor.map(t => t._2 -> t._3).toMap
      }
    }
  }
}

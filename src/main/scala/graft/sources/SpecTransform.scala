package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Pmod, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One partition-spec field — identity (`col`) or a DERIVED transform
  * (`days(ts)`, `bucket(16, id)`, `truncate(4, name)`): the Iceberg
  * hidden-partitioning contract re-expressed over the versioned table's
  * hive-shaped layout. The manifest records the SPELLING; writers
  * compute the partition value from the source column
  * ([[valueColumn]]); leaf pruning projects predicates on the SOURCE
  * column onto transform values ([[projectLit]] + the monotonicity
  * flag), so a plain `ts >= X` range prunes day directories without the
  * user ever naming a partition column.
  *
  * Reference context: the reference engine partitions on a physical
  * `partition_id` string the pipeline materializes by hand
  * (`config/AppConfig.java` partition naming) — hidden partitioning is
  * that idiom with the materialization moved inside the table format.
  */
private[graft] sealed trait SpecField {
  /** Canonical spec spelling (what the manifest records). */
  def spelling: String
  /** The SOURCE data column the value derives from. */
  def source: String
  /** The directory-level name (`<dirName>=<value>` in leaf paths). */
  def dirName: String
  /** Derived partition value as a Column over `df` (the frame gives
    * the source column's type where the expression depends on it). */
  def valueIn(df: org.apache.spark.sql.DataFrame): Column
  def isIdentity: Boolean = false
  /** Order-preserving from source to transform space? (what makes
    * range predicates projectable: `src OP lit` ⇒ `T(src) OP T(lit)`
    * with the boundary kept).
    */
  def monotonic: Boolean = false
  /** The transform applied to a source-typed literal, rendered in the
    * same STRING space as the leaf directory value — None when this
    * literal/type cannot be projected (caller keeps the leaf).
    */
  def projectLit(value: Any, dt: DataType): Option[String] = None
  /** Compare two transform-space dir strings; None when they do not
    * order in this transform's space (caller keeps the leaf).
    */
  def compareValues(a: String, b: String): Option[Int] = None
}

private[graft] final case class IdentityField(source: String)
    extends SpecField {
  override def spelling: String = source
  override def dirName: String = source
  override def valueIn(df: org.apache.spark.sql.DataFrame): Column =
    col(source)
  override def isIdentity: Boolean = true
}

/** `days(ts)` — the value is the source's UTC calendar date rendered
  * `yyyy-MM-dd` (readable leaf dirs AND monotonic under plain string
  * comparison, which keeps the pruning compare trivial). Sources:
  * timestamp or date.
  */
private[graft] final case class DaysField(source: String)
    extends SpecField {
  override def spelling: String = s"days($source)"
  override def dirName: String = s"${source}_day"
  override def valueIn(df: org.apache.spark.sql.DataFrame): Column =
    col(source).cast(DateType)
  override def monotonic: Boolean = true
  override def projectLit(value: Any, dt: DataType): Option[String] =
    dt match {
      case TimestampType | DateType | StringType =>
        Option(Cast(Literal(value, dt), DateType, Some("UTC")).eval(null))
          .map(days => java.time.LocalDate.ofEpochDay(
            days.asInstanceOf[Int].toLong).toString)
      case _ => None
    }
  override def compareValues(a: String, b: String): Option[Int] =
    Some(a.compareTo(b)) // ISO dates order lexicographically
}

/** `months(ts)` / `years(ts)` / `hours(ts)` — the remaining Iceberg
  * time transforms: the value is a zero-padded UTC rendering
  * (`yyyy-MM`, `yyyy`, `yyyy-MM-dd-HH` — Iceberg's spellings), which
  * is BOTH readable and monotonic under plain string comparison.
  * Rendering assumes the GraftSession UTC contract (the write path's
  * `date_format` uses the session timezone; the projection is pinned
  * UTC — a non-UTC session would misalign them, which is why the
  * session builder pins UTC).
  */
private[graft] final case class TimeUnitField(unit: String, source: String)
    extends SpecField {
  private val (suffix, pattern) = unit match {
    case "months" => ("month", "yyyy-MM")
    case "years" => ("year", "yyyy")
    case "hours" => ("hour", "yyyy-MM-dd-HH")
    case other => throw new IllegalArgumentException(
      s"unknown time unit '$other'")
  }
  override def spelling: String = s"$unit($source)"
  override def dirName: String = s"${source}_$suffix"
  override def valueIn(df: org.apache.spark.sql.DataFrame): Column =
    date_format(col(source), pattern)
  override def monotonic: Boolean = true
  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern(pattern).withZone(java.time.ZoneOffset.UTC)
  override def projectLit(value: Any, dt: DataType): Option[String] =
    dt match {
      case TimestampType =>
        Some(fmt.format(java.time.Instant.EPOCH.plus(
          value.asInstanceOf[Long],
          java.time.temporal.ChronoUnit.MICROS)))
      case DateType =>
        Some(fmt.format(java.time.LocalDate
          .ofEpochDay(value.asInstanceOf[Int].toLong)
          .atStartOfDay(java.time.ZoneOffset.UTC)))
      case _ => None
    }
  override def compareValues(a: String, b: String): Option[Int] =
    Some(a.compareTo(b)) // zero-padded renderings order lexicographically
}

/** `bucket(n, col)` — `xxhash64(col) mod n` (Spark's codegen'd 64-bit
  * hash on both the write path and the literal projection, so the two
  * can never disagree). Only equality shapes prune — a hash has no
  * order to project.
  */
private[graft] final case class BucketField(n: Int, source: String)
    extends SpecField {
  require(n > 0, s"bucket($n, $source): bucket count must be positive")
  override def spelling: String = s"bucket($n,$source)"
  override def dirName: String = s"${source}_bucket"
  // NULL stays NULL (xxhash64 of a null input returns the seed, which
  // would silently give null rows a valid bucket — the write path must
  // refuse them like every other null partition value)
  override def valueIn(df: org.apache.spark.sql.DataFrame): Column =
    when(col(source).isNull, lit(null))
      .otherwise(pmod(xxhash64(col(source)), lit(n)))
  override def projectLit(value: Any, dt: DataType): Option[String] =
    Option(Pmod(XxHash64(Seq(Literal(value, dt)), 42L),
      Literal(n.toLong)).eval(null)).map(_.toString)
  override def compareValues(a: String, b: String): Option[Int] =
    if (a == b) Some(0) else None // equality only — no order
}

/** `truncate(w, col)` — numeric floor-to-multiple (`v - (v mod w)`,
  * mod non-negative so the floor goes toward -∞) or string prefix.
  * Numeric values order as longs; string prefixes restrict to
  * equality (UTF8 binary order vs JVM string order differ off-ASCII —
  * a wrong comparison direction would prune wrongly, refusing is
  * conservative).
  */
private[graft] final case class TruncateField(w: Int, source: String)
    extends SpecField {
  require(w > 0, s"truncate($w, $source): width must be positive")
  override def spelling: String = s"truncate($w,$source)"
  override def dirName: String = s"${source}_trunc"
  override def valueIn(df: org.apache.spark.sql.DataFrame): Column = {
    val c = col(source)
    df.schema(source).dataType match {
      case StringType => substring(c, 1, w)
      case ByteType | ShortType | IntegerType | LongType =>
        c - pmod(c, lit(w.toLong))
      case other => throw new UnsupportedOperationException(
        s"truncate($w, $source) over ${other.catalogString} — supported " +
          "sources are integral and string types")
    }
  }
  override def projectLit(value: Any, dt: DataType): Option[String] =
    dt match {
      case StringType =>
        val s = value.asInstanceOf[UTF8String].toString
        Some(if (s.length <= w) s else s.substring(0, w))
      case ByteType | ShortType | IntegerType | LongType =>
        val v = value.asInstanceOf[Number].longValue()
        Some((v - java.lang.Math.floorMod(v, w.toLong)).toString)
      case _ => None
    }
  override def monotonic: Boolean = true
  override def compareValues(a: String, b: String): Option[Int] =
    (scala.util.Try(a.toLong).toOption,
        scala.util.Try(b.toLong).toOption) match {
      case (Some(x), Some(y)) => Some(java.lang.Long.compare(x, y))
      case _ => if (a == b) Some(0) else None // string prefix: eq only
    }
}

private[graft] object SpecField {
  private val DaysRe = """days\s*\(\s*([^(),\s]+)\s*\)""".r
  private val TimeUnitRe =
    """(months|years|hours)\s*\(\s*([^(),\s]+)\s*\)""".r
  private val BucketRe = """bucket\s*\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)""".r
  private val TruncRe = """truncate\s*\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)""".r

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, SpecField]()

  /** Parse one spec spelling; loud on anything unrecognized that looks
    * like a transform call.
    */
  def parse(spelling: String): SpecField =
    cache.computeIfAbsent(spelling.trim, {
      case DaysRe(src) => DaysField(src)
      case TimeUnitRe(unit, src) => TimeUnitField(unit, src)
      case BucketRe(n, src) => BucketField(n.toInt, src)
      case TruncRe(w, src) => TruncateField(w.toInt, src)
      case s if s.contains("(") || s.contains(")") =>
        throw new UnsupportedOperationException(
          s"unsupported partition transform '$s' — supported: identity, " +
            "days/months/years/hours(col), bucket(n,col), truncate(w,col)")
      case s => IdentityField(s)
    })
}

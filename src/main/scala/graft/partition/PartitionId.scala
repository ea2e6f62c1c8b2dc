package graft.partition

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Partition-ID algebra for date-encoded string partition values.
  *
  * The reference encodes dates into a single STRING partition column in three
  * naming schemes (reference: util/PartitionUtils.java:20-27):
  *
  *   - `yyyyMMdd`            — current-day partition   (CURRENT)
  *   - `yyyyMMdd-n`          — n-th reload of a day    (PREVIOUS)
  *   - `history_yyyyMMdd[-n]`— archived partition      (HISTORY)
  *
  * Parsing extracts the 8-digit base date from any form
  * (reference: util/PartitionUtils.java:36-57). This algebra drives
  * driver-side coarse partition pruning — knowledge Catalyst cannot have,
  * since a time-range predicate implies a partition-ID set only by
  * convention (SURVEY.md §4.1).
  *
  * Re-expressed as a Scala ADT. All pure; no Spark dependency, so it is
  * usable both on the driver (pruning a partition list before any job) and
  * inside distributed expressions if ever needed.
  */
sealed trait PartitionId {
  def raw: String
  def date: LocalDate
  /** reload / archive sequence number, if the scheme carries one */
  def sequence: Option[Int]
}

object PartitionId {
  final case class Current(date: LocalDate, raw: String) extends PartitionId {
    def sequence: Option[Int] = None
  }
  final case class Previous(date: LocalDate, seq: Int, raw: String) extends PartitionId {
    def sequence: Option[Int] = Some(seq)
  }
  final case class History(date: LocalDate, seq: Option[Int], raw: String) extends PartitionId {
    def sequence: Option[Int] = seq
  }

  private val CurrentRe  = """^(\d{8})$""".r
  private val PreviousRe = """^(\d{8})-(\d+)$""".r
  private val HistoryRe  = """^history_(\d{8})(?:-(\d+))?$""".r
  // STRICT + "uuuu": reject impossible dates like 20260230 (SMART would
  // silently resolve them to the month's last day)
  private val Fmt = DateTimeFormatter.ofPattern("uuuuMMdd")
    .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  private def parseDate(s: String): Option[LocalDate] =
    try Some(LocalDate.parse(s, Fmt)) catch { case _: Exception => None }

  /** Parse a raw partition value into the ADT; None for unrecognized forms
    * (reference throws ParseException — PartitionUtils.java:56; we prefer
    * Option and let callers decide: the date-range filter skips, strict
    * callers throw via [[parseOrThrow]]).
    */
  def parse(raw: String): Option[PartitionId] = raw match {
    case CurrentRe(d)      => parseDate(d).map(Current(_, raw))
    case PreviousRe(d, n)  => parseDate(d).map(Previous(_, n.toInt, raw))
    case HistoryRe(d, n)   => parseDate(d).map(History(_, Option(n).map(_.toInt), raw))
    case _                 => None
  }

  def parseOrThrow(raw: String): PartitionId =
    parse(raw).getOrElse(
      throw new IllegalArgumentException(s"Invalid partition ID format: $raw"))

  def isValid(raw: String): Boolean = parse(raw).isDefined

  /** Keep partition IDs whose base date falls in [start, end) — start
    * inclusive, end exclusive, mirroring the criteria time window
    * (reference: util/PartitionUtils.java:110-134). Unparseable IDs are
    * skipped (conservative: they can never be pruned *in*, but the caller
    * [[graft.core.PartitionHandler]] falls back to ALL partitions on error,
    * matching PartitionHandler.java:94-96).
    */
  def filterByDateRange(
      raw: Seq[String],
      start: Option[LocalDate],
      end: Option[LocalDate]): Seq[String] =
    raw.filter { id =>
      parse(id) match {
        case Some(p) =>
          start.forall(s => !p.date.isBefore(s)) && end.forall(e => p.date.isBefore(e))
        case None => false
      }
    }

  /** Chronological sort by parsed date; unparseable IDs compare
    * lexicographically among themselves and sort last
    * (reference falls back to lexicographic on parse error —
    * PartitionUtils.java:177-180).
    */
  def sortChronologically(raw: Seq[String]): Seq[String] = {
    val (ok, bad) = raw.partition(isValid)
    ok.sortBy { id =>
      val p = parseOrThrow(id)
      (p.date.toEpochDay, p.sequence.getOrElse(-1), p.raw)
    } ++ bad.sorted
  }

  /** `pc='v'` spec text for DDL `PARTITION (...)` clauses
    * (reference: PartitionUtils.java:159-161). Backslashes then single
    * quotes are escaped — the reference interpolates raw; escaping quotes
    * alone would leave a value ending in `\` producing `\'` (an escaped
    * quote) and an unterminated literal.
    */
  def partitionSpec(partitionColumn: String, value: String): String = {
    val escaped = value.replace("\\", "\\\\").replace("'", "\\'")
    s"$partitionColumn='$escaped'"
  }
}

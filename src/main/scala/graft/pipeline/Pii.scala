package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** PII scrubbing — the standard pre-release redaction pass over a text
  * corpus: detect and replace emails, phone numbers, and IPv4 addresses
  * with typed placeholder tokens, reporting per-document match counts.
  *
  * The patterns deliberately use the regex subset with identical semantics
  * in java.util.regex (Spark) and RE2 (DuckDB): character classes, bounded
  * repetition, and ASCII \b word boundaries — no lookarounds or
  * backreferences (RE2 has neither). Counts are over the ORIGINAL text
  * per pattern independently; redaction chains email → ipv4 → phone on
  * the running string, identically in both engines (DuckDB needs the 'g'
  * flag — its regexp_replace is first-match-only by default, Spark's is
  * global).
  *
  * Scale design: pure per-row column expressions (regexp_count /
  * regexp_replace are codegen'd) — single scan, zero shuffle; the only
  * non-map cost is the presentation sort.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val IpToken = "<IP>"

  /** The chained redaction as a Column over a `text` column — THE single
    * definition ([[scrub]] reports it; [[Curation.curateFull]] applies it
    * inline on its one corpus scan).
    */
  def redactedCol: org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), EmailRe, EmailToken),
        Ipv4Re, IpToken),
      PhoneRe, PhoneToken)

  /** The combined detection flag as a Column over a `text` column. */
  def hasPiiCol: org.apache.spark.sql.Column =
    regexp_count(col("text"), lit(EmailRe)) +
      regexp_count(col("text"), lit(PhoneRe)) +
      regexp_count(col("text"), lit(Ipv4Re)) > 0

  /** Per-doc PII counts, combined flag, and the redacted text. */
  def scrub(spark: SparkSession, sfDir: String): DataFrame =
    scrubOf(Tables.documents(spark, sfDir))

  /** [[scrub]] over any (doc_id, text) frame. */
  def scrubOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).as("n_phones"),
      regexp_count(col("text"), lit(Ipv4Re)).as("n_ips"),
      hasPiiCol.as("has_pii"),
      redactedCol.as("redacted"))
      .orderBy("doc_id")

  /** DuckDB oracle — same patterns, same chained global replacement. */
  val scrubSql: String = {
    def cnt(re: String) = s"len(regexp_extract_all(text, '$re'))"
    s"""SELECT doc_id,
       |  ${cnt(EmailRe)} AS n_emails,
       |  ${cnt(PhoneRe)} AS n_phones,
       |  ${cnt(Ipv4Re)} AS n_ips,
       |  (${cnt(EmailRe)} + ${cnt(PhoneRe)} + ${cnt(Ipv4Re)}) > 0 AS has_pii,
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace(text, '$EmailRe', '$EmailToken', 'g'),
       |      '$Ipv4Re', '$IpToken', 'g'),
       |    '$PhoneRe', '$PhoneToken', 'g') AS redacted
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** K-ANONYMITY AUDIT — the release-gating census a data-governance pass
    * runs before publishing records keyed by quasi-identifiers (Sweeney's
    * public k-anonymity model): group by the quasi-identifier tuple
    * (nation, market segment — the kind of demographic pair that
    * re-identifies when a group is small) and report, per segment, how
    * many equivalence groups and rows fall BELOW the k threshold — the
    * rows a k-anonymous release must suppress or generalize — alongside
    * the published complement and the smallest/largest group. The
    * suppression accounting is the same discipline as the takedown
    * entries: the risky population is pinned by count, not by promise.
    *
    * Scale shape: one groupBy on the quasi tuple (partial-aggregated;
    * group count bounded by the quasi domain, here nations × segments),
    * then a segments-sized rollup — nothing row-sized past the first
    * shuffle.
    */
  def kAnonymity(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).cast("long").as("n"))
    groups.groupBy(col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).cast("long").as("n_groups"),
        sum(col("n")).cast("long").as("n_rows"),
        min(col("n")).cast("long").as("min_group"),
        max(col("n")).cast("long").as("max_group"),
        sum(when(col("n") < k, lit(1L)).otherwise(0L)).cast("long")
          .as("groups_below_k"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).cast("long")
          .as("rows_suppressed"),
        sum(when(col("n") >= k, col("n")).otherwise(0L)).cast("long")
          .as("rows_published"))
      .orderBy("segment")
  }

  /** l-diversity audit — k-anonymity's necessary complement: a group can
    * be large (k-safe) yet expose its members anyway when everyone in it
    * shares the sensitive value (homogeneity attack). Per quasi-identifier
    * group (segment, nation) this counts DISTINCT sensitive classes
    * (account-balance bands of 1000), then reports per segment how many
    * groups fall below `l` and how many rows sit in them — the rows a
    * publisher must generalize or suppress. Same two-level aggregation
    * shape as [[kAnonymity]]: partial-aggregable, one shuffle on the QI
    * key, no row ever leaves its partition unaggregated.
    */
  def lDiversity(spark: SparkSession, sfDir: String, l: Int = 3): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .withColumn("sens", floor(col("c_acctbal") / 1000.0).cast("long"))
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(countDistinct(col("sens")).cast("long").as("ldiv"),
        count(lit(1)).cast("long").as("n"))
    groups.groupBy(col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).cast("long").as("n_groups"),
        min(col("ldiv")).cast("long").as("min_l"),
        max(col("ldiv")).cast("long").as("max_l"),
        sum(when(col("ldiv") < l, lit(1L)).otherwise(0L)).cast("long")
          .as("groups_below_l"),
        sum(when(col("ldiv") < l, col("n")).otherwise(0L)).cast("long")
          .as("rows_at_risk"))
      .orderBy("segment")
  }

  def lDiversitySql(l: Int = 3): String =
    s"""WITH g AS (
       |  SELECT c_mktsegment, c_nationkey,
       |    CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
       |         AS BIGINT) AS ldiv,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM customer GROUP BY 1, 2)
       |SELECT c_mktsegment AS segment,
       |  CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(min(ldiv) AS BIGINT) AS min_l,
       |  CAST(max(ldiv) AS BIGINT) AS max_l,
       |  CAST(sum(CASE WHEN ldiv < $l THEN 1 ELSE 0 END) AS BIGINT)
       |    AS groups_below_l,
       |  CAST(sum(CASE WHEN ldiv < $l THEN n ELSE 0 END) AS BIGINT)
       |    AS rows_at_risk
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** Column-masking policy — the "publishable view" a data owner derives
    * before sharing a table: direct identifiers PSEUDONYMIZE (md5 —
    * deterministic, so joins/linkage across masked datasets still work,
    * unlike suppression), quantitative attributes GENERALIZE to bands
    * (the k-anonymity lever), and structural keys pass through. Pure
    * codegen'd column expressions — map-only, no shuffle, no UDF; at
    * 100 TB this is a projection over the scan.
    */
  def maskColumns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(
      col("c_custkey"),
      md5(col("c_name").cast("binary")).as("name_pseudo"),
      col("c_nationkey"),
      (floor(col("c_acctbal") / 1000.0).cast("long") * 1000L).as("acctbal_band"),
      col("c_mktsegment"))
      .orderBy("c_custkey")

  def maskColumnsSql(): String =
    """SELECT c_custkey,
      |  md5(c_name) AS name_pseudo,
      |  c_nationkey,
      |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) * 1000 AS acctbal_band,
      |  c_mktsegment
      |FROM customer ORDER BY c_custkey""".stripMargin

  def kAnonymitySql(k: Int = 5): String =
    s"""WITH g AS (
       |  SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
       |  FROM customer GROUP BY 1, 2)
       |SELECT c_mktsegment AS segment,
       |  CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(min(n) AS BIGINT) AS min_group,
       |  CAST(max(n) AS BIGINT) AS max_group,
       |  CAST(sum(CASE WHEN n < $k THEN 1 ELSE 0 END) AS BIGINT) AS groups_below_k,
       |  CAST(sum(CASE WHEN n < $k THEN n ELSE 0 END) AS BIGINT) AS rows_suppressed,
       |  CAST(sum(CASE WHEN n >= $k THEN n ELSE 0 END) AS BIGINT) AS rows_published
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
}

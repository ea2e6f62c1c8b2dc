package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Declarative data-quality constraint suite (the Deequ-style pre-ingest
  * gate a training pipeline runs before a batch is allowed into the
  * corpus). One report row per constraint: `(constraint, violations,
  * total, passed)`.
  *
  * Scale shape — the point of the design is how the constraints FUSE:
  *
  *  - Every row-local constraint (completeness, domain membership, value
  *    range) compiles to a conditional `sum` in ONE aggregate over ONE
  *    scan of the fact table — adding a tenth row-local constraint adds
  *    zero scans and zero shuffles, just one more partial-aggregated
  *    column (shuffle payload = one row of counters per map task).
  *  - Uniqueness is the one constraint class that inherently needs a
  *    key-grouped pass (a duplicate is only visible once both copies
  *    meet), so it pays exactly one hash aggregate on the key — partial
  *    per-key counts map-side, `count > 1` groups summed after.
  *  - Referential integrity is the one constraint class that needs the
  *    OTHER table: a left-anti join against the parent keyset, broadcast
  *    because a parent key column prunes to a fraction of the parent
  *    table (at 100 TB with a fact-sized parent this becomes the one
  *    shuffled join in the report).
  *
  * The three classes are kept as three separately-visible stages rather
  * than one opaque union so a scheduler can gate on the cheap fused pass
  * first and only pay for uniqueness/RI when it is green.
  */
object DataQuality {

  private val OrderStatuses = Seq("P", "O", "F")

  /** Constraint report over `orders` (with `customer` as the RI parent). */
  def qualityReport(spark: SparkSession, sfDir: String): DataFrame =
    reportFor(Tables.orders(spark, sfDir), Tables.customer(spark, sfDir))

  /** The constraint engine against arbitrary child/parent frames — the
    * injectable core the spec drives with PLANTED violations (the shipped
    * testdata is clean, so the gated entry alone would only ever prove
    * the all-green path).
    */
  def reportFor(orders: DataFrame, customer: DataFrame): DataFrame = {
    val violCol = (pred: org.apache.spark.sql.Column) =>
      sum(when(pred, 1L).otherwise(0L))

    // one fused scan: every row-local constraint + the row total
    val fused = orders.agg(
      count(lit(1)).as("total"),
      violCol(col("o_custkey").isNull).as("v_complete_custkey"),
      violCol(col("o_orderdate").isNull).as("v_complete_orderdate"),
      violCol(!col("o_orderstatus").isin(OrderStatuses: _*) ||
        col("o_orderstatus").isNull).as("v_domain_status"),
      violCol(col("o_totalprice").isNull ||
        col("o_totalprice") <= 0).as("v_range_totalprice"))

    // one key-grouped pass: rows whose o_orderkey occurs more than once
    val dupRows = orders.groupBy("o_orderkey")
      .agg(count(lit(1)).as("cnt")).where(col("cnt") > 1)
      .agg(coalesce(sum("cnt"), lit(0L)).as("v_unique_orderkey"))

    // one RI pass: child keys with no parent (broadcast the parent keyset)
    val parents = customer.select("c_custkey")
    val orphans = orders.join(broadcast(parents),
        orders("o_custkey") === parents("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_ri_custkey"))

    val one = fused.crossJoin(dupRows).crossJoin(orphans)
    val constraints = Seq(
      ("completeness:o_custkey", "v_complete_custkey"),
      ("completeness:o_orderdate", "v_complete_orderdate"),
      ("domain:o_orderstatus", "v_domain_status"),
      ("range:o_totalprice_positive", "v_range_totalprice"),
      ("uniqueness:o_orderkey", "v_unique_orderkey"),
      ("referential:o_custkey->customer", "v_ri_custkey"))
    // unpivot the single metrics row into one report row per constraint
    val stacked = constraints.map { case (name, c) =>
      struct(lit(name).as("check_name"), col(c).cast("long").as("violations"))
    }
    one.select(col("total"), explode(array(stacked: _*)).as("m"))
      .select(col("m.check_name").as("check_name"),
        col("m.violations").as("violations"),
        col("total").cast("long").as("total"))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("check_name")
  }

  /** The DIRTY variant: the shipped tables are clean, so the plain entry
    * only ever oracle-gates the all-green path. This one derives a
    * deterministically corrupted orders table — nulled keys, a bad
    * status domain, non-positive prices, duplicated keys, orphaned
    * custkeys, each on its own orderkey residue class — and runs the
    * SAME constraint engine, so the violation COUNTING path is gated by
    * an independent engine, not just the spec's planted fixtures.
    */
  def qualityReportDirty(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val dirty = o.select(
      col("o_orderkey"),
      when(col("o_orderkey") % 97 === 0, lit(null))
        .otherwise(col("o_custkey")).as("o_custkey"),
      when(col("o_orderkey") % 89 === 0, lit("X"))
        .otherwise(col("o_orderstatus")).as("o_orderstatus"),
      when(col("o_orderkey") % 83 === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("o_totalprice"),
      when(col("o_orderkey") % 79 === 0, lit(null))
        .otherwise(col("o_orderdate")).as("o_orderdate"))
      // duplicated keys: re-emit every 101st row
      .unionByName(o.filter(col("o_orderkey") % 101 === 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate"))
      // orphans: every 103rd row points at a customer that cannot exist
      .withColumn("o_custkey",
        when(col("o_orderkey") % 103 === 0, lit(-1L))
          .otherwise(col("o_custkey")))
    reportFor(dirty, Tables.customer(spark, sfDir))
  }

  val qualityReportDirtySql: String =
    """WITH base AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 103 = 0 THEN -1
      |         WHEN o_orderkey % 97 = 0 THEN NULL
      |         ELSE o_custkey END AS o_custkey,
      |    CASE WHEN o_orderkey % 89 = 0 THEN 'X'
      |         ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN o_orderkey % 83 = 0 THEN -o_totalprice
      |         ELSE o_totalprice END AS o_totalprice,
      |    CASE WHEN o_orderkey % 79 = 0 THEN NULL
      |         ELSE o_orderdate END AS o_orderdate
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 103 = 0 THEN -1 ELSE o_custkey END,
      |    o_orderstatus, o_totalprice, o_orderdate
      |  FROM orders WHERE o_orderkey % 101 = 0),
      |t AS (SELECT count(*) AS total FROM base),
      |fused AS (
      |  SELECT
      |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v1,
      |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS v2,
      |    sum(CASE WHEN o_orderstatus IS NULL
      |             OR o_orderstatus NOT IN ('P','O','F') THEN 1 ELSE 0 END) AS v3,
      |    sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
      |             THEN 1 ELSE 0 END) AS v4
      |  FROM base),
      |dup AS (
      |  SELECT coalesce(sum(cnt), 0) AS v5 FROM (
      |    SELECT count(*) AS cnt FROM base GROUP BY o_orderkey
      |    HAVING count(*) > 1)),
      |ri AS (
      |  SELECT count(*) AS v6 FROM base o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                    WHERE c.c_custkey = o.o_custkey)),
      |rows_ AS (
      |  SELECT 'completeness:o_custkey' AS check_name,
      |         CAST(v1 AS BIGINT) AS violations FROM fused
      |  UNION ALL SELECT 'completeness:o_orderdate', CAST(v2 AS BIGINT) FROM fused
      |  UNION ALL SELECT 'domain:o_orderstatus', CAST(v3 AS BIGINT) FROM fused
      |  UNION ALL SELECT 'range:o_totalprice_positive', CAST(v4 AS BIGINT) FROM fused
      |  UNION ALL SELECT 'uniqueness:o_orderkey', CAST(v5 AS BIGINT) FROM dup
      |  UNION ALL SELECT 'referential:o_custkey->customer', CAST(v6 AS BIGINT) FROM ri)
      |SELECT r.check_name, r.violations, CAST(t.total AS BIGINT) AS total,
      |       r.violations = 0 AS passed
      |FROM rows_ r CROSS JOIN t
      |ORDER BY check_name""".stripMargin

  val qualityReportSql: String =
    """WITH t AS (SELECT count(*) AS total FROM orders),
      |fused AS (
      |  SELECT
      |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v1,
      |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS v2,
      |    sum(CASE WHEN o_orderstatus IS NULL
      |             OR o_orderstatus NOT IN ('P','O','F') THEN 1 ELSE 0 END) AS v3,
      |    sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
      |             THEN 1 ELSE 0 END) AS v4
      |  FROM orders),
      |dup AS (
      |  SELECT coalesce(sum(cnt), 0) AS v5 FROM (
      |    SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey
      |    HAVING count(*) > 1)),
      |ri AS (
      |  SELECT count(*) AS v6 FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                    WHERE c.c_custkey = o.o_custkey)),
      |rows_ AS (
      |  SELECT 'completeness:o_custkey' AS check_name,
      |         CAST(v1 AS BIGINT) AS violations FROM fused
      |  UNION ALL SELECT 'completeness:o_orderdate', CAST(v2 AS BIGINT) FROM fused
      |  UNION ALL SELECT 'domain:o_orderstatus', CAST(v3 AS BIGINT) FROM fused
      |  UNION ALL SELECT 'range:o_totalprice_positive', CAST(v4 AS BIGINT) FROM fused
      |  UNION ALL SELECT 'uniqueness:o_orderkey', CAST(v5 AS BIGINT) FROM dup
      |  UNION ALL SELECT 'referential:o_custkey->customer', CAST(v6 AS BIGINT) FROM ri)
      |SELECT r.check_name, r.violations, CAST(t.total AS BIGINT) AS total,
      |       r.violations = 0 AS passed
      |FROM rows_ r CROSS JOIN t
      |ORDER BY check_name""".stripMargin
}

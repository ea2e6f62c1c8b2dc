package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** ORACLE-GATED AUDIT surface for the physical data-layout family. The
  * WRITE-side operators live in `graft.sources` and are plan-spec-proven
  * there ([[graft.sources.Layout.writeZOrderLayout]] range-partitions and
  * sorts by the Morton code so parquet footers carry compact 2-D regions;
  * [[graft.sources.Bucketing.writeBucketed]] buys exchange-free co-located
  * joins; `sources/Skew.scala` salts hot keys). This object adds the
  * DuckDB-checkable query entries those writers cannot express — the
  * census/stats side of the same techniques, with exact integer
  * arithmetic where the writers use rank-preserving doubles:
  *
  *  - '''Z-order clustering''' ([[zorderLayout]]): interleave the bits of
  *    two filter dimensions so one sorted write yields tight per-file
  *    min/max ranges on BOTH — multi-dimensional data skipping (the
  *    public Delta `OPTIMIZE ZORDER BY` / Hudi space-curve design). A
  *    linear sort clusters one dimension and destroys the other.
  *  - '''Bucketed co-located joins''' ([[bucketedJoin]]): pre-hash both
  *    fact tables into the same bucket layout on the join key at WRITE
  *    time, so every subsequent join of the pair runs with ZERO shuffle —
  *    the amortize-the-shuffle-once design for fact-to-fact joins too big
  *    to broadcast (at 100 TB a lineitem⋈orders shuffle moves both tables
  *    across the wire on every query; bucketing moves them once, ever).
  *
  * Reference scope note: the reference job (HiveTableDeletionJob) has no
  * layout optimizer — these are extension-surface operators for the
  * training-data pipeline, in the same oracle-gated discipline.
  */
object LayoutAudit {

  /** Bits per dimension in the Z-value (8+8 → 16-bit z). */
  private val ZBits = 8

  /** Z-values per output bucket: 2^10 of the 2^16 z-space → 64 buckets,
    * i.e. an 8×8 grid — each bucket pins the top 3 bits of BOTH dims.
    */
  private val ZPerBucket = 1024L

  /** The Morton interleave as a sum of 2·ZBits single-bit terms in pure
    * integer arithmetic — bit i of `u` lands at z-bit 2i+1 and bit i of
    * `d` at z-bit 2i. `div`/`%` only (no shift builtins), so the DuckDB
    * oracle can mirror the arithmetic exactly; inputs are non-negative by
    * construction (range-scaled into [0, 256)).
    */
  private def zTerms(intDiv: String): String =
    (0 until ZBits).map { i =>
      val bit = 1L << i
      s"((u $intDiv $bit) % 2) * ${1L << (2 * i + 1)} + " +
        s"((d $intDiv $bit) % 2) * ${1L << (2 * i)}"
    }.mkString(" + ")

  /** Z-ORDER LAYOUT AUDIT over events on (user_id, day-of-year): range-
    * scales each dimension into the 8-bit z-domain from a min/max stats
    * pass (the public Delta `OPTIMIZE ZORDER` design — columns are
    * range-RANKED before interleaving precisely so an id column and a
    * 30-day date column get equal z-resolution; exact min-max scaling
    * keeps this entry deterministic and oracle-mirrorable where rank
    * sampling would not be), computes the 16-bit Morton z-value, assigns
    * rows to 64 fixed z-range buckets (a production write would
    * `repartitionByRange` on z and sort within partitions, letting
    * parquet footers carry the min/max; fixed boundaries keep the entry
    * oracle-exact), and reports each bucket's row count and min/max on
    * BOTH scaled dimensions.
    *
    * The payoff the output exhibits (and `LayoutAuditSpec` pins): every
    * bucket's u-range AND d-range each fit inside one 32-wide strip — so
    * a point predicate on EITHER dimension prunes to ≤ 8 of 64 buckets
    * (12.5 %). A linear sort on u gives 1/64 for u but 64/64 for d.
    *
    * Scale shape: a column-pruned min/max stats aggregate (broadcast as
    * one row), then one scan → map-only z projection → a single partial-
    * aggregated groupBy with 64 groups. At 100 TB this is the stats pass
    * of an OPTIMIZE job; the shuffle carries 64 rows per map task.
    */
  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.events(spark, sfDir).select(
      col("user_id").cast("long").as("uid"),
      dayofyear(col("ts")).cast("long").as("doy"))
    val bounds = raw.agg(
      min("uid").as("u0"), max("uid").as("u1"),
      min("doy").as("d0"), max("doy").as("d1"))
    val dims = raw.crossJoin(broadcast(bounds)).select(
      expr("((uid - u0) * 256) div (u1 - u0 + 1)").cast("long").as("u"),
      expr("((doy - d0) * 256) div (d1 - d0 + 1)").cast("long").as("d"))
    dims
      .withColumn("z", expr(zTerms("div")).cast("long"))
      .withColumn("bucket", expr(s"z div $ZPerBucket").cast("long"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        min("u").as("min_u"), max("u").as("max_u"),
        min("d").as("min_d"), max("d").as("max_d"))
      .orderBy("bucket")
  }

  def zorderLayoutSql(): String =
    s"""WITH raw AS (
       |  SELECT user_id AS uid, dayofyear(ts) AS doy FROM events),
       |bounds AS (
       |  SELECT min(uid) AS u0, max(uid) AS u1,
       |         min(doy) AS d0, max(doy) AS d1 FROM raw),
       |dims AS (
       |  SELECT ((uid - u0) * 256) // (u1 - u0 + 1) AS u,
       |         ((doy - d0) * 256) // (d1 - d0 + 1) AS d
       |  FROM raw, bounds),
       |zed AS (
       |  SELECT u, d, ${zTerms("//")} AS z FROM dims)
       |SELECT z // $ZPerBucket AS bucket, count(*) AS n_rows,
       |  min(u) AS min_u, max(u) AS max_u,
       |  min(d) AS min_d, max(d) AS max_d
       |FROM zed GROUP BY 1 ORDER BY 1""".stripMargin

  /** BUCKETED CO-LOCATED JOIN: write orders and lineitem through
    * [[graft.sources.Bucketing.writeBucketed]] into the SAME bucket
    * count, then join the bucketed tables — the scan's hash-bucket layout
    * already satisfies the join's clustering requirement, so the
    * sort-merge join runs with
    * NO exchange on either side (`LayoutAuditSpec` pins zero shuffles below
    * the join). The only shuffles in the whole plan are the 5-group final
    * aggregate and the presentation sort.
    *
    * This is the fact-to-fact answer where [[graft.operators.Analytics]]
    * broadcasts dimensions: at 100 TB neither side broadcasts, and
    * re-shuffling both tables per query is the single largest avoidable
    * cost in the plan. Bucketing pays that shuffle once at ingest.
    *
    * The entry pays the bucketed write inline each call (the build-inline
    * discipline of the `*_store` entries); a deployment writes once and
    * joins forever. Bucket files are written sorted per writer task, so
    * Spark may insert a per-bucket merge sort above the scan — cheap,
    * local, and exchange-free.
    */
  def bucketedJoin(spark: SparkSession, sfDir: String,
      nBuckets: Int = 16): DataFrame = {
    val dir = Stores.temp("graft_bkt")
    val oTab = "graft_bkt_orders"
    val lTab = "graft_bkt_lineitem"
    spark.sql(s"DROP TABLE IF EXISTS $oTab")
    spark.sql(s"DROP TABLE IF EXISTS $lTab")
    // the two bucketed ingest writes land in disjoint catalog tables and
    // disjoint dirs — independent actions, overlapped (guide §2.6; the
    // r15 store-build pattern): the smaller orders write back-fills the
    // lineitem shuffle's tail instead of queueing behind it
    graft.core.Par.run2(
      graft.sources.Bucketing.writeBucketed(
        Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority"),
        oTab, "o_orderkey", nBuckets, Some(s"$dir/orders")),
      graft.sources.Bucketing.writeBucketed(
        Tables.lineitem(spark, sfDir)
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        lTab, "l_orderkey", nBuckets, Some(s"$dir/lineitem")))
    // merge hint: the point is the exchange-free SMJ, not a broadcast
    spark.table(lTab).hint("merge")
      .join(spark.table(oTab).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).cast("long").as("n_items"))
      .orderBy("o_orderpriority")
  }

  def bucketedJoinSql(): String =
    """SELECT o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** DYNAMIC PARTITION PRUNING over a date-partitioned fact: events are
    * written partitioned by day (the layout the deletion engine's own
    * tables use), then joined to a small date dimension whose SELECTIVE
    * filter is on a NON-join column (`week`) — so no static rewrite can
    * prune the fact, and Catalyst instead injects a runtime subquery on
    * the fact scan's partition column (visible as a
    * `dynamicpruning` partition filter; `LayoutAuditSpec` pins it and pins
    * the scan to exactly the dimension's surviving days).
    *
    * At 100 TB this is THE star-schema scan reducer: the fact side reads
    * only the partitions the filtered dimension names at runtime —
    * 7/30ths of the table here — where a DPP-less plan scans all of it.
    * The build-inline partitioned write is the fixture; a deployment's
    * fact table is already laid out this way.
    */
  def dppJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Stores.temp("graft_dpp")
    Tables.events(spark, sfDir)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("pdate").parquet(s"$dir/events")
    val fact = spark.read.parquet(s"$dir/events")
    // the date dimension a star schema ships: one row per day with
    // attributes; filter on the attribute, join on the key
    val dim = Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("date_key"),
        weekofyear(col("ts")).cast("long").as("week"))
      .distinct()
    fact.join(broadcast(dim.filter(col("week") === 2L)),
        col("pdate") === col("date_key"))
      .groupBy("pdate")
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(round(col("value") * 1e6).cast("long")).as("value_micros"))
      .orderBy("pdate")
  }

  def dppJoinSql(): String =
    """WITH e AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS pdate, weekofyear(ts) AS week,
      |         value
      |  FROM events)
      |SELECT pdate, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_micros
      |FROM e WHERE week = 2
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** THE COMPOSED LAYOUT — [[dppJoin]]'s date partitioning AND
    * [[zorderLayout]]'s multi-dimensional clustering on ONE table
    * ([[graft.sources.Layout.writePartitionedZOrder]]): events are
    * hive-partitioned by day and z-ordered on (user_id, hour) within
    * each partition, then queried with a filtered-dimension join (no
    * static date predicate — pruning must be the runtime
    * `dynamicpruning` subquery) plus a selective user_id range predicate
    * (data-relative: the bottom eighth of the id domain, so the entry
    * stays selective at every sf). One scan gets BOTH prunings: DPP
    * picks 7/30 partition directories; parquet footer min/max over the
    * z-clustered files skips the high-z files inside each (any z ≥ 2^15
    * forces the top user-id bit, so the top-of-z files provably contain
    * no bottom-eighth ids). LayoutSpec pins the dynamic filter, the
    * pushed user_id predicate, and intersecting-files < all-files on the
    * same scan — the Delta OPTIMIZE deployment shape at 100 TB, where
    * the two prunings multiply: 7/30 dirs × ~half the files in each.
    */
  def composedLayoutJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Layout
    val dir = Stores.temp("graft_dppz")
    val ev = Tables.events(spark, sfDir)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("hod", hour(col("ts")).cast("long"))
    Layout.writePartitionedZOrder(ev, s"$dir/events", "pdate",
      "user_id", "hod", numFiles = 96)
    val fact = spark.read.parquet(s"$dir/events")
    val cut = Tables.events(spark, sfDir)
      .agg(expr("(max(user_id) + 1) div 8").cast("long")).first().getLong(0)
    val dim = Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("date_key"),
        weekofyear(col("ts")).cast("long").as("week"))
      .distinct()
    fact.filter(col("user_id") < cut)
      .join(broadcast(dim.filter(col("week") === 2L)),
        col("pdate") === col("date_key"))
      .groupBy("pdate")
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(round(col("value") * 1e6).cast("long")).as("value_micros"))
      .orderBy("pdate")
  }

  def composedLayoutJoinSql(): String =
    """WITH cut AS (SELECT (max(user_id) + 1) // 8 AS c FROM events),
      |e AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS pdate, weekofyear(ts) AS week,
      |         user_id, value
      |  FROM events)
      |SELECT pdate, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_micros
      |FROM e, cut WHERE week = 2 AND user_id < c
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** RUNTIME BLOOM-FILTER JOIN — the shuffle-join sibling of [[dppJoin]]'s
    * partition pruning: a selective filter on the dimension side makes
    * Catalyst inject `bloom_filter_agg` over the dim keys and push
    * `might_contain` into the FACT SCAN, so non-matching fact rows die
    * before the join shuffle instead of after it. DPP prunes whole
    * partition directories; the bloom prunes ROWS inside whatever must be
    * scanned — at 100 TB they compose (this is Spark's own runtime
    * filtering, switched on and thresholds sized for the fixture scale).
    *
    * The injected filter only changes WHERE rows are dropped, never which
    * rows survive — which is what lets a plain-join DuckDB oracle
    * hash-gate the bloom plan (the `events_salted_join` argument). Confs
    * are scoped: set, EXECUTED inside (the plan must be compiled and run
    * while they hold — a lazily returned frame would plan after the
    * finally restored them), restored on any exit; the rows-sized result
    * returns as a local frame.
    */
  def bloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "50MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    val rows =
      try {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        bloomJoinFrame(spark, sfDir).collect().toSeq
      } finally saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      bloomJoinFrame(spark, sfDir).schema)
  }

  /** The join itself — separated so the plan spec can pin the injected
    * bloom on the executed plan under an isolated session.
    */
  private[pipeline] def bloomJoinFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sfDir)
    o.join(c.hint("merge"), o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .orderBy("o_orderpriority")
  }

  val bloomJoinSql: String =
    """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY 1 ORDER BY 1""".stripMargin
}

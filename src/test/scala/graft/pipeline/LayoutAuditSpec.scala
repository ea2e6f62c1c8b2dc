package graft.pipeline

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

class LayoutAuditSpec extends AnyFunSuite {
  // isolated SQLConf: the bucketed-join plan probe flips AQE off, and the
  // bucketed catalog tables must not collide with other suites' sessions
  private lazy val spark = SparkTestSession.isolated()
  private val sfDir = "/root/testdata/sf0.001"

  private def count[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Int =
    p.collect(pf).size

  test("z-order: every bucket is simultaneously tight on BOTH dimensions") {
    val rows = LayoutAudit.zorderLayout(spark, sfDir).collect()
    // range-scaling must spread both dims across the grid — a near-empty
    // bucket set would make every skipping assertion below vacuous
    assert(rows.length >= 32, s"only ${rows.length} of 64 buckets occupied")
    for (r <- rows) {
      val (minU, maxU) = (r.getAs[Long]("min_u"), r.getAs[Long]("max_u"))
      val (minD, maxD) = (r.getAs[Long]("min_d"), r.getAs[Long]("max_d"))
      // 64 buckets = the top 3 bits of each dim → each bucket's range on
      // EACH dim fits one 32-wide strip. A linear sort can only give this
      // on one dimension.
      assert(minU / 32 === maxU / 32, s"bucket ${r.getLong(0)} u-strip")
      assert(minD / 32 === maxD / 32, s"bucket ${r.getLong(0)} d-strip")
    }
    // point-predicate skipping on either dim: at most the 8 buckets of
    // the point's strip can contain it
    for (dim <- Seq(("min_u", "max_u"), ("min_d", "max_d")); point <- 0L until 256L) {
      val covering = rows.count(r =>
        r.getAs[Long](dim._1) <= point && point <= r.getAs[Long](dim._2))
      assert(covering <= 8, s"point $point on $dim covered by $covering buckets")
    }
  }

  test("z-order: conservation — bucket counts sum to the table size") {
    val total = LayoutAudit.zorderLayout(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_rows")).first().getLong(0)
    assert(total === graft.sources.Tables.events(spark, sfDir).count())
  }

  test("bucketed join: sort-merge with ZERO exchange below the join") {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = LayoutAudit.bucketedJoin(spark, sfDir).queryExecution.executedPlan
      val joins = plan.collect { case j: SortMergeJoinExec => j }
      assert(joins.size === 1)
      assert(count(plan) { case b: BroadcastHashJoinExec => b } === 0)
      // the join's subtree reads both bucketed scans directly — no shuffle
      assert(count(joins.head) { case e: ShuffleExchangeExec => e } === 0)
      // whole plan: only the final aggregate + presentation sort exchange
      assert(count(plan) { case e: ShuffleExchangeExec => e } === 2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("dpp join: fact scan carries a runtime dynamicpruning partition filter") {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = LayoutAudit.dppJoin(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      // the partitioned fact scan's partition filter is the RUNTIME
      // subquery DPP injects — no static filter on pdate exists anywhere
      val fact = scans.filter(_.relation.partitionSchema.nonEmpty)
      assert(fact.nonEmpty)
      assert(fact.exists(_.partitionFilters.exists(
        _.toString.contains("dynamicpruning"))), plan.toString.take(2000))
      // and the pruned read touches exactly the dimension's 7 days
      val rows = df.collect()
      assert(rows.length === 7)
      assert(rows.map(_.getAs[Long]("n_events")).sum ===
        graft.sources.Tables.events(spark, sfDir)
          .filter(org.apache.spark.sql.functions.weekofyear(
            org.apache.spark.sql.functions.col("ts")) === 2).count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("composed layout: dynamicpruning AND file-level min/max skipping on ONE scan") {
    import org.apache.spark.sql.functions._
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = LayoutAudit.composedLayoutJoin(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      val fact = scans.filter(_.relation.partitionSchema.nonEmpty)
      assert(fact.nonEmpty)
      // pruning 1: the partition filter is the RUNTIME subquery (no
      // static date predicate exists in the query)
      assert(fact.exists(_.partitionFilters.exists(
        _.toString.contains("dynamicpruning"))), plan.toString.take(2000))
      // pruning 2 precondition: the user_id range predicate reaches the
      // parquet reader, where footer min/max skips non-intersecting files
      assert(fact.exists(_.metadata.get("PushedFilters")
          .exists(_.contains("LessThan(user_id"))),
        fact.map(_.metadata.get("PushedFilters")).mkString("\n"))
      assert(df.collect().length === 7)

      // pruning 2 evidence on the written layout itself: within each
      // DPP-selected partition directory, the per-file user_id footer
      // ranges leave a STRICT subset intersecting [0, cut) — z >= 2^15
      // forces the top user-id bit, so top-of-z files cannot hold
      // bottom-eighth ids. (Same audit Delta's OPTIMIZE metrics report.)
      val factPath = fact.head.relation.location.rootPaths.head.toString
      val cut = graft.sources.Tables.events(spark, sfDir)
        .agg(expr("(max(user_id) + 1) div 8")).first().getLong(0)
      val selectedDates = graft.sources.Tables.events(spark, sfDir)
        .filter(weekofyear(col("ts")) === 2)
        .select(date_format(col("ts"), "yyyy-MM-dd")).distinct()
        .collect().map(_.getString(0)).toSeq
      val fs = new org.apache.hadoop.fs.Path(factPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      var (allFiles, hitFiles, multiFileDirs) = (0, 0, 0)
      selectedDates.foreach { d =>
        val dirPath = new org.apache.hadoop.fs.Path(s"$factPath/pdate=$d")
        val files = fs.listStatus(dirPath).toSeq
          .map(_.getPath.toString).filter(_.endsWith(".parquet"))
        if (files.size > 1) multiFileDirs += 1
        files.foreach { f =>
          val mm = spark.read.parquet(f)
            .agg(min(col("user_id")), max(col("user_id"))).first()
          allFiles += 1
          if (mm.getLong(0) < cut) hitFiles += 1
        }
      }
      assert(multiFileDirs > 0, "the in-partition split must yield multiple files")
      assert(hitFiles < allFiles,
        s"footer ranges must skip files: $hitFiles/$allFiles intersect [0,$cut)")
      assert(hitFiles > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("bucketed join result equals the plain shuffled join") {
    val bucketed = LayoutAudit.bucketedJoin(spark, sfDir).collect().toSeq
    import org.apache.spark.sql.functions._
    val plain = graft.sources.Tables.lineitem(spark, sfDir)
      .join(graft.sources.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        org.apache.spark.sql.functions.count(lit(1)).cast("long").as("n_items"))
      .orderBy("o_orderpriority")
      .collect().toSeq
    assert(bucketed === plain)
  }

  test("bloom join: might_contain lands on the fact side; result equals plain join") {
    val s2 = graft.testkit.SparkTestSession.isolated()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "50MB")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = LayoutAudit.bloomJoinFrame(s2, sfDir)
    val withBloom = df.collect().map(_.toSeq).toSeq
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_filter_agg"),
      s"the dim side must build a runtime bloom:\n$plan")
    assert(plan.toLowerCase.contains("might_contain"),
      s"the fact side must filter through might_contain:\n$plan")
    // the injected filter never changes WHICH rows survive
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val plain = LayoutAudit.bloomJoinFrame(s2, sfDir).collect().map(_.toSeq).toSeq
    assert(withBloom === plain)
  }
}

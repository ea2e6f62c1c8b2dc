package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

/** The persisted IVF-PQ store must serve probes without retraining or
  * rescanning embeddings, and build+probe must reproduce the one-shot
  * knnIvfPq bit-for-bit (they share the DuckDB oracle).
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def queries(n: Int) = Tables.embeddings(spark, sfDir)
    .where(col("vec_id") < n)
    .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    .collect()
    .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

  test("store probe reproduces the one-shot knnIvfPq result exactly") {
    val store = Files.createTempDirectory("graft-ann-eq").toString
    AnnIndex.buildStore(Tables.embeddings(spark, sfDir), store)
    val probed = AnnIndex.probeStore(spark, store, queries(10))
    val oneShot = ProductQuant.knnIvfPq(spark, sfDir)
    assert(probed.count() > 0)
    assert(probed.exceptAll(oneShot).isEmpty && oneShot.exceptAll(probed).isEmpty,
      "store-served search must be bit-identical to the inline-trained form")
  }

  test("probe plan reads ONLY the codes table — no embeddings scan, no training") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // isolated session + AQE off so FileSourceScanExec nodes are statically
    // visible (under AQE they hide inside AdaptiveSparkPlanExec)
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val store = Files.createTempDirectory("graft-ann-plan").toString
    AnnIndex.buildStore(Tables.embeddings(s, sfDir), store)
    val probe = AnnIndex.probeStore(s, store, queries(10))
    val scans = probe.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec => sc.relation.location.rootPaths.mkString(",")
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.contains(store)),
      s"probe must scan the store only, found scans of:\n${scans.mkString("\n")}")
    // specifically the codes table — centroids/codebooks are driver-held
    // parameters, not plan inputs, so exactly one distributed input exists
    assert(scans.forall(_.contains("codes")),
      s"the probe's only distributed input is codes/, found:\n${scans.mkString("\n")}")
  }

  test("multi-probe widens recall: per-query best score is non-decreasing in nProbe") {
    val store = Files.createTempDirectory("graft-ann-nprobe").toString
    AnnIndex.buildStore(Tables.embeddings(spark, sfDir), store)
    def best(nProbe: Int): Map[Long, Long] =
      AnnIndex.probeStore(spark, store, queries(10), k = 1, nProbe = nProbe)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val b1 = best(1); val b2 = best(2); val b4 = best(4)
    assert(b1.keySet === b2.keySet && b2.keySet === b4.keySet)
    // probing more cells only ADDS candidates, so the top score per query
    // cannot drop — a strict dominance property of the probe list
    b1.foreach { case (q, s1) =>
      assert(b2(q) >= s1, s"query $q: nProbe=2 top score ${b2(q)} < nProbe=1 $s1")
      assert(b4(q) >= b2(q), s"query $q: nProbe=4 top score ${b4(q)} < nProbe=2 ${b2(q)}")
    }
  }

  test("append encodes against the existing index: an appended near-dup is found immediately") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft-ann-append").toString
    val e = Tables.embeddings(spark, sfDir)
    AnnIndex.buildStore(e, store)
    val nBefore = spark.read.parquet(AnnIndex.codesPath(store)).count()
    // a planted near-copy of query 0 (one coordinate bumped) under a new id
    val q0 = queries(1).head._2
    val planted = q0.clone(); planted(7) = planted(7) + 0.05
    AnnIndex.appendToStore(Seq((900000L, planted)).toDF("vec_id", "embedding"), store)
    assert(spark.read.parquet(AnnIndex.codesPath(store)).count() === nBefore + 1,
      "append must add exactly the batch's code rows — no rebuild, no dups")
    val top = AnnIndex.probeStore(spark, store, queries(1), k = 3)
      .where(col("query_id") === 0).orderBy("rank")
      .select("neighbor_id").collect().map(_.getLong(0))
    assert(top.contains(900000L),
      s"the appended near-dup must surface in query 0's top-3, got ${top.toSeq}")
  }

  test("refine: exact re-rank of the shortlist, id IN-list pushed to the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val store = Files.createTempDirectory("graft-ann-refine").toString
    val e = Tables.embeddings(s, sfDir)
    AnnIndex.buildStore(e, store)
    val qs = queries(10)
    val shortlistK = 20
    val refined = AnnIndex.refineProbe(s, store, e, qs, k = 5,
      shortlistK = shortlistK)
    // invariant: the refined top-k IS the exact-integer-dot ranking of the
    // shortlist — recompute both stages on the driver and compare
    val shortlist = AnnIndex.probeStore(s, store, qs, k = shortlistK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val vq: Map[Long, Array[Long]] = e
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> Similarity.quantizeVec(r.getSeq[Double](1).toArray))
      .toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val expect = shortlist.groupBy(_._1).toSeq.flatMap { case (q, pairs) =>
      pairs.map { case (_, n) => (q, n, dot(vq(q), vq(n))) }
        .sortBy { case (_, n, sc) => (-sc, n) }
        .take(5).zipWithIndex
        .map { case ((qq, n, sc), i) => (qq, (i + 1).toLong, n, sc) }
    }.sorted
    val got = refined.collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got === expect,
      "refined top-k must equal the exact-dot re-ranking of the shortlist")
    // the refine stage's embeddings scan carries the shortlist id IN-list
    val scans = refined.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec if sc.relation.location.rootPaths
        .mkString(",").contains("embeddings") => sc.metadata("PushedFilters")
    }
    assert(scans.nonEmpty && scans.forall(_.contains("In(vec_id")),
      s"refine scan must push the id IN-list, got: ${scans.mkString(";")}")
  }

  test("probe-many: repeated probes answer from the same store, consistently") {
    val store = Files.createTempDirectory("graft-ann-many").toString
    AnnIndex.buildStore(Tables.embeddings(spark, sfDir), store)
    val p1 = AnnIndex.probeStore(spark, store, queries(5)).collect().toSeq
    val p2 = AnnIndex.probeStore(spark, store, queries(5)).collect().toSeq
    assert(p1 === p2, "same store + same queries must be deterministic")
    // a different query batch against the SAME artifact (no rebuild)
    val wider = AnnIndex.probeStore(spark, store, queries(10))
    assert(wider.select("query_id").distinct().count() === 10)
  }
}

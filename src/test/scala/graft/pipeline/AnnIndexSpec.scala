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

  private def leafState(dir: String): Map[String, Set[(String, Long)]] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new java.io.File(dir)
    root.listFiles().filter(_.isDirectory).map { leaf =>
      leaf.getName -> walk(leaf)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toSet
    }.toMap
  }

  test("delete-from-store: probe-after-delete equals a store whose codes were rebuilt without the ids") {
    import org.apache.hadoop.fs.Path
    val e = Tables.embeddings(spark, sfDir)
    val ids = e.where(col("vec_id") % 17 === 3)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ids.nonEmpty)
    val a = Files.createTempDirectory("graft-ann-del-a").toString
    AnnIndex.buildStore(e, a)
    AnnIndex.deleteFromStore(spark, a, ids)
    // reference: an identically built store (deterministic training) whose
    // codes/ is REWRITTEN IN FULL without the deleted rows — what the
    // slice-rewrite must be equivalent to
    val b = Files.createTempDirectory("graft-ann-del-b").toString
    AnnIndex.buildStore(e, b)
    val keptCodes = spark.read.parquet(AnnIndex.codesPath(b))
      .where(!col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("cell"), col("codes"),
        col("shard").cast("int").as("shard"))
      .collect()
    val fs = new Path(b).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(AnnIndex.codesPath(b)), true)
    import spark.implicits._
    keptCodes.map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toArray, r.getInt(3)))
      .toSeq.toDF("vec_id", "cell", "codes", "shard")
      .write.partitionBy("shard").parquet(AnnIndex.codesPath(b))
    val pa = AnnIndex.probeStore(spark, a, queries(10)).collect().toSeq
    val pb = AnnIndex.probeStore(spark, b, queries(10)).collect().toSeq
    assert(pa === pb, "slice-rewrite delete must equal the full codes rewrite")
    assert(pa.nonEmpty)
    val neighbors = pa.map(_.getLong(2)).toSet
    assert(neighbors.intersect(ids.toSet).isEmpty,
      "no deleted vector may surface as a neighbor")
    // idempotent: re-running the delete (the crash-heal path) changes nothing
    AnnIndex.deleteFromStore(spark, a, ids)
    assert(AnnIndex.probeStore(spark, a, queries(10)).collect().toSeq === pa)
  }

  test("delete rewrites ONLY the affected shard leaves (codes and vectors)") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    val store = Files.createTempDirectory("graft-ann-slice").toString
    AnnIndex.buildStore(e, store)
    AnnIndex.appendVectors(e, store, overwrite = true)
    val id = 123L
    val cell = spark.read.parquet(AnnIndex.codesPath(store))
      .where(col("vec_id") === id).select("cell").collect().head.getLong(0)
    val codeShard = java.lang.Math.floorMod(cell, AnnIndex.CellShards.toLong)
    val vecShard = java.lang.Math.floorMod(id, AnnIndex.VecShards.toLong)
    val codesBefore = leafState(AnnIndex.codesPath(store))
    val vecsBefore = leafState(AnnIndex.vectorsPath(store))
    AnnIndex.deleteFromStore(spark, store, Seq(id))
    val codesAfter = leafState(AnnIndex.codesPath(store))
    val vecsAfter = leafState(AnnIndex.vectorsPath(store))
    codesBefore.keys.filterNot(_ == s"shard=$codeShard").foreach { leaf =>
      assert(codesAfter(leaf) === codesBefore(leaf),
        s"codes $leaf must be untouched by a delete in shard=$codeShard")
    }
    assert(codesAfter(s"shard=$codeShard") !== codesBefore(s"shard=$codeShard"),
      "the affected codes leaf must be rewritten")
    vecsBefore.keys.filterNot(_ == s"shard=$vecShard").foreach { leaf =>
      assert(vecsAfter(leaf) === vecsBefore(leaf),
        s"vectors $leaf must be untouched by a delete in shard=$vecShard")
    }
    assert(spark.read.parquet(AnnIndex.vectorsPath(store))
      .where(col("vec_id") === id).count() === 0L,
      "the raw vector (the sensitive payload) must be gone")
    assert(spark.read.parquet(AnnIndex.codesPath(store))
      .where(col("vec_id") === id).count() === 0L)
  }

  test("probe plan prunes codes partitions to the wanted shards") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val store = Files.createTempDirectory("graft-ann-prune").toString
    AnnIndex.buildStore(Tables.embeddings(s, sfDir), store)
    val probe = AnnIndex.probeStore(s, store, queries(3))
    val scans = probe.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec if sc.relation.location.rootPaths
        .mkString(",").contains("codes") => sc
    }
    assert(scans.nonEmpty)
    // the shard IN-list is a partition filter (directory pruning — foreign
    // shards are never listed into the scan), and the cell IN-list still
    // reaches the files as a pushed data filter for row-group pruning
    assert(scans.forall(_.metadata("PartitionFilters").contains("shard")),
      scans.map(_.metadata("PartitionFilters")).mkString("\n"))
    assert(scans.forall(_.metadata("PushedFilters").contains("In(cell")),
      scans.map(_.metadata("PushedFilters")).mkString("\n"))
    val nShards = new java.io.File(AnnIndex.codesPath(store))
      .listFiles().count(_.getName.startsWith("shard="))
    val selected = scans.head.relation.location
      .listFiles(scans.head.partitionFilters, scans.head.dataFilters).length
    assert(selected < nShards,
      s"3 queries must not scan all $nShards shards (selected $selected)")
  }

  test("store health: per-cell drift after a delete, zero drift before") {
    val e = Tables.embeddings(spark, sfDir)
    val store = Files.createTempDirectory("graft-ann-health-spec").toString
    AnnIndex.buildStore(e, store)
    val clean = AnnIndex.storeHealth(spark, store).collect()
    assert(clean.nonEmpty)
    clean.foreach { r =>
      assert(r.getLong(1) === r.getLong(3) && r.getLong(2) === r.getLong(4),
        s"fresh store must show zero drift, got $r")
    }
    val ids = e.where(col("vec_id") % 17 === 3)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    AnnIndex.deleteFromStore(spark, store, ids)
    val after = AnnIndex.storeHealth(spark, store).collect()
    val lost = after.map(r => r.getLong(1) - r.getLong(3)).sum
    assert(lost === ids.length.toLong,
      s"per-cell count drops must sum to the deleted ids (${ids.length}), got $lost")
    after.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), s"delete cannot grow a cell: $r")
      assert(r.getLong(4) <= r.getLong(2), s"delete cannot grow energy: $r")
    }
  }

  test("recluster after append+delete equals a fresh build over the current corpus") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    val store = Files.createTempDirectory("graft-ann-recl").toString
    AnnIndex.buildStore(e, store)
    // drift the store: append a novel vector, delete a slice
    val novel = Array.tabulate(64)(i => if (i == 11) 1.0 else 0.0)
    AnnIndex.appendToStore(Seq((888000L, novel.toSeq)).toDF("vec_id", "embedding"), store)
    val ids = e.where(col("vec_id") % 17 === 3)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    AnnIndex.deleteFromStore(spark, store, ids)
    // current corpus = survivors + the appended vector
    val current = e.where(!col("vec_id").isin(ids: _*))
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("embedding"))
      .unionByName(Seq((888000L, novel.toSeq)).toDF("vec_id", "embedding"))
    AnnIndex.reclusterStore(current, store)
    val fresh = Files.createTempDirectory("graft-ann-recl-ref").toString
    AnnIndex.buildStore(current, fresh)
    val pr = AnnIndex.probeStore(spark, store, queries(10)).collect().toSeq
    val pf = AnnIndex.probeStore(spark, fresh, queries(10)).collect().toSeq
    assert(pr === pf, "recluster must equal a fresh build over the same corpus")
    assert(pr.nonEmpty)
    // health baseline was re-snapshotted: zero drift again
    AnnIndex.storeHealth(spark, store).collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(3), s"post-recluster drift must be zero: $r")
    }
  }

  test("nProbe recall audit: hi dominates lo per query, values in [0, 1]") {
    val rows = AnnIndex.annRecallNprobe(spark, sfDir, nQueries = 10, k = 5)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L until 10L))
    rows.foreach { r =>
      val (lo, hi) = (r.getLong(1), r.getLong(3))
      assert(lo >= 0L && lo <= 5L && hi >= 0L && hi <= 5L)
      assert(hi >= lo,
        s"query ${r.getLong(0)}: widening the probe lost recall ($lo -> $hi)")
      assert(r.getDouble(2) <= r.getDouble(4))
    }
    assert(rows.map(_.getLong(3)).sum > 0L, "audit is vacuous (0 hits at hi)")
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

  test("shard fan-out is a recorded store parameter: a non-default " +
      "build probes identically, deletes consistently, and keeps " +
      "partition pruning") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val emb = Tables.embeddings(s, sfDir)
    val store = Files.createTempDirectory("graft-ann-fan").toString
    AnnIndex.buildStore(emb, store, cellShards = 8, vecShards = 4)
    AnnIndex.appendVectors(emb, store)
    // the directory fan-out IS the recorded parameter
    val codeShards = new java.io.File(AnnIndex.codesPath(store))
      .listFiles().count(_.getName.startsWith("shard="))
    val vecShards = new java.io.File(AnnIndex.vectorsPath(store))
      .listFiles().count(_.getName.startsWith("shard="))
    assert(codeShards <= 8 && vecShards <= 4,
      s"fan-outs must honor the build parameters: $codeShards/$vecShards")
    // probe results do not depend on the fan-out (same oracle)
    val probed = AnnIndex.probeStore(s, store, queries(10))
    val oneShot = ProductQuant.knnIvfPq(s, sfDir)
    assert(probed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(probed).isEmpty,
      "fan-out must not change probe results")
    // partition pruning on the recorded fan-out still fires
    val probe3 = AnnIndex.probeStore(s, store, queries(3))
    val scans = probe3.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec if sc.relation.location.rootPaths
        .mkString(",").contains("codes") => sc
    }
    assert(scans.nonEmpty &&
      scans.forall(_.metadata("PartitionFilters").contains("shard")),
      scans.map(_.metadata("PartitionFilters")).mkString("; "))
    // delete arithmetic reproduces the RECORDED fan-out (a session
    // default of 32 would rewrite the wrong vector leaves)
    val ids = emb.select("vec_id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    AnnIndex.deleteFromStore(s, store, ids)
    val left = AnnIndex.probeStore(s, store, queries(10))
    assert(left.filter(col("neighbor_id").isin(ids: _*)).count() === 0L,
      "deleted ids must not surface from any shard")
    assert(s.read.parquet(AnnIndex.vectorsPath(store))
      .filter(col("vec_id").isin(ids: _*)).count() === 0L,
      "the vectors side table must lose the ids too")
  }
}

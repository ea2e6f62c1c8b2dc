package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** BM25 retrieval invariants: well-formed rankings, every hit really
  * contains a query term, and score ordering matches a driver-side
  * recomputation of the same rational-idf formula.
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val out = Search.bm25TopK(spark, sfDir).cache()

  test("per-query rankings are contiguous and score-monotone") {
    val byQuery = out.collect().groupBy(_.getString(0))
    assert(byQuery.keySet === Set("q1", "q2", "q3"))
    byQuery.foreach { case (q, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.toSeq === (1 to rows.length), s"$q ranks not contiguous")
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"$q scores not non-increasing")
      assert(rows.length <= 10)
    }
  }

  test("every hit contains at least one of its query's terms") {
    val terms = Map(
      "q1" -> Set("vector", "hash"),
      "q2" -> Set("merge", "join"),
      "q3" -> Set("slow", "query", "scan"))
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    out.collect().foreach { r =>
      val (q, doc) = (r.getString(0), r.getLong(2))
      assert(terms(q).intersect(texts(doc)).nonEmpty, s"$q hit $doc has no query term")
      assert(r.getLong(4) === terms(q).intersect(texts(doc)).size,
        s"n_terms_hit mismatch for $q/$doc")
    }
  }

  test("persisted index: probe reproduces the one-shot ranking exactly") {
    val out2 = Search.bm25TopKStore(spark, sfDir)
    assert(out2.count() > 0)
    assert(out2.exceptAll(out).isEmpty && out.exceptAll(out2).isEmpty,
      "index-served retrieval must be bit-identical to the one-shot form")
  }

  test("shard fan-out is a recorded store parameter: a non-default " +
      "index probes identically, appends and deletes consistently") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val store =
      java.nio.file.Files.createTempDirectory("graft-bm25-fan").toString
    Search.buildIndex(docs, store, termShards = 8, docShards = 4)
    assert(new java.io.File(Search.postingsPath(store))
      .listFiles().count(_.getName.startsWith("shard=")) <= 8)
    assert(new java.io.File(Search.doclensPath(store))
      .listFiles().count(_.getName.startsWith("shard=")) <= 4)
    val q = Seq("q1" -> "vector", "q1" -> "hash", "q2" -> "merge")
    val defStore =
      java.nio.file.Files.createTempDirectory("graft-bm25-fan32").toString
    Search.buildIndex(docs, defStore)
    val a = Search.probeIndex(spark, store, q)
    val b = Search.probeIndex(spark, defStore, q)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "fan-out must not change probe results")
    // append and delete read the RECORDED fan-out
    val id = docs.select("doc_id").orderBy("doc_id").limit(1)
      .collect().head.getLong(0)
    Search.deleteFromIndex(spark, store, Seq(id), "fan-del")
    assert(spark.read.parquet(Search.doclensPath(store))
      .where(col("doc_id") === id).count() === 0L)
    assert(Search.postingsDf(spark, store)
      .where(col("doc_id") === id).count() === 0L)
  }

  test("persisted index: probe plan scans the store only, term IN-list pushed down") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val store = java.nio.file.Files.createTempDirectory("graft-bm25-plan").toString
    Search.buildIndex(graft.sources.Tables.documents(s, sfDir), store)
    val probe = Search.probeIndex(s, store, Seq("q1" -> "vector", "q1" -> "hash"))
    val scans = probe.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec => sc
    }
    assert(scans.nonEmpty)
    val paths = scans.map(_.relation.location.rootPaths.mkString(","))
    assert(paths.forall(_.contains(store)),
      s"probe must scan the store only, found scans of:\n${paths.mkString("\n")}")
    // the term IN-list must reach the postings scan as a pushed filter so
    // only matching terms' row groups are read — the fix for the one-shot
    // form's full-vocabulary shuffle
    val postingsScans = scans.filter(
      _.relation.location.rootPaths.mkString(",").contains("postings"))
    assert(postingsScans.nonEmpty)
    assert(postingsScans.forall(_.metadata("PushedFilters").contains("In(term")),
      postingsScans.map(_.metadata("PushedFilters")).mkString("\n"))
    // the query terms' shards are a PARTITION filter: foreign shards are
    // pruned at the directory level, before any file I/O
    assert(postingsScans.forall(_.metadata("PartitionFilters").contains("shard")),
      postingsScans.map(_.metadata("PartitionFilters")).mkString("\n"))
    val nShards = new java.io.File(Search.postingsPath(store))
      .listFiles().count(_.getName.startsWith("shard="))
    val selected = postingsScans.head.relation.location
      .listFiles(postingsScans.head.partitionFilters,
        postingsScans.head.dataFilters).length
    assert(selected < nShards,
      s"2 query terms must not scan all $nShards shards (selected $selected)")
  }

  test("persisted index: append equals a full rebuild, probe-for-probe") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val seed = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    val appended = java.nio.file.Files.createTempDirectory("graft-bm25-app").toString
    Search.buildIndex(seed, appended)
    Search.appendToIndex(batch, appended, "b1")
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-bm25-reb").toString
    Search.buildIndex(docs, rebuilt)
    // stats totals identical by construction
    assert(Search.statsTotals(spark, appended) === Search.statsTotals(spark, rebuilt))
    // probes bit-identical: postings row set and stats agree, and scoring
    // is a pure function of both
    val pa = Search.probeIndex(spark, appended, Search.QueryTerms).collect().toSeq
    val pr = Search.probeIndex(spark, rebuilt, Search.QueryTerms).collect().toSeq
    assert(pa === pr, "append+probe must equal rebuild+probe")
    assert(pa.nonEmpty)
  }

  test("append replay shield: re-appending a committed batchId is a no-op") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val store = java.nio.file.Files.createTempDirectory("graft-bm25-replay").toString
    Search.buildIndex(docs.where(col("doc_id") % 10 =!= 0), store)
    val batch = docs.where(col("doc_id") % 10 === 0)
    Search.appendToIndex(batch, store, "day-1")
    val stats1 = Search.statsTotals(spark, store)
    val probe1 = Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq
    // a caller retry / crash-replay re-sends the SAME logical batch: it
    // must not inflate tf rows, df, or the stats totals
    Search.appendToIndex(batch, store, "day-1")
    assert(Search.statsTotals(spark, store) === stats1,
      "replayed append must not change stats")
    assert(Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq === probe1,
      "replayed append must not change probe results")
  }

  test("persisted index: an empty append batch is a no-op, not a crash") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val store = java.nio.file.Files.createTempDirectory("graft-bm25-empty").toString
    Search.buildIndex(docs, store)
    val before = Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq
    Search.appendToIndex(docs.where(col("doc_id") < 0), store, "empty-day")
    val after = Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq
    assert(after === before, "an empty append must leave the index unchanged")
  }

  test("delete-from-index: probe equals a rebuild over the survivors, and differs from pre-delete") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val store = java.nio.file.Files.createTempDirectory("graft-bm25-del").toString
    Search.buildIndex(docs, store)
    val preDelete = Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq
    val ids = docs.where(col("doc_id") % 13 === 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.nonEmpty)
    Search.deleteFromIndex(spark, store, ids, "takedown-spec")
    val after = Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-bm25-surv").toString
    Search.buildIndex(docs.where(!(col("doc_id") % 13 === 5)), rebuilt)
    val ref = Search.probeIndex(spark, rebuilt, Search.QueryTerms).collect().toSeq
    assert(after === ref, "delete must equal a rebuild over the survivors")
    assert(after !== preDelete,
      "the delete must actually change the ranking (non-vacuous fixture)")
    assert(after.nonEmpty)
    assert(after.forall(r => r.getLong(2) % 13 !== 5),
      "no deleted doc may appear in the results")
    // idempotent: the crash-heal path re-runs the same call
    Search.deleteFromIndex(spark, store, ids, "takedown-spec")
    assert(Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq === after)
    assert(Search.statsTotals(spark, store) === Search.statsTotals(spark, rebuilt),
      "stats after delete must equal the survivor rebuild's")
  }

  test("delete rewrites only the affected shard leaves; append batches stay journaled") {
    import graft.sources.Tables
    def leafState(dir: String): Map[String, Set[(String, Long)]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      new java.io.File(dir).listFiles().filter(_.isDirectory).map { leaf =>
        leaf.getName -> walk(leaf)
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toSet
      }.toMap
    }
    val docs = Tables.documents(spark, sfDir)
    val store = java.nio.file.Files.createTempDirectory("graft-bm25-slice").toString
    Search.buildIndex(docs, store)
    val id = docs.select("doc_id").orderBy("doc_id").limit(1)
      .collect().head.getLong(0)
    val terms = docs.where(col("doc_id") === id)
      .select(explode(split(col("text"), " ")).as("term"))
      .distinct().collect().map(_.getString(0))
    val termShards =
      terms.map(Search.termShardJvm(_, Search.TermShards)).toSet
    val docShard = java.lang.Math.floorMod(id, Search.DocShards.toLong)
    val postBefore = leafState(Search.postingsPath(store))
    val lensBefore = leafState(Search.doclensPath(store))
    Search.deleteFromIndex(spark, store, Seq(id), "one-doc")
    val postAfter = leafState(Search.postingsPath(store))
    val lensAfter = leafState(Search.doclensPath(store))
    postBefore.keys.filterNot(l => termShards(l.stripPrefix("shard=").toInt))
      .foreach { leaf =>
        assert(postAfter(leaf) === postBefore(leaf),
          s"postings $leaf holds none of the doc's terms and must be untouched")
      }
    lensBefore.keys.filterNot(_ == s"shard=$docShard").foreach { leaf =>
      assert(lensAfter(leaf) === lensBefore(leaf),
        s"doclens $leaf must be untouched by a delete in shard=$docShard")
    }
    assert(lensAfter(s"shard=$docShard") !== lensBefore(s"shard=$docShard"),
      "the deleted doc's doclens leaf must be rewritten")
  }

  test("compaction folds the journal into the base; probes and stats unchanged") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val store = java.nio.file.Files.createTempDirectory("graft-bm25-compact").toString
    Search.buildIndex(docs.where(col("doc_id") % 10 =!= 0), store)
    Search.appendToIndex(docs.where(col("doc_id") % 10 === 0), store, "day-1")
    Search.deleteFromIndex(spark, store,
      docs.where(col("doc_id") % 13 === 5).select("doc_id")
        .collect().map(_.getLong(0)).toSeq, "takedown-c")
    val probe = Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq
    val stats = Search.statsTotals(spark, store)
    Search.compactIndex(spark, store)
    assert(!new java.io.File(Search.batchesPath(store)).exists(),
      "compaction must fold the journal away")
    assert(Search.statsTotals(spark, store) === stats)
    assert(Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq === probe,
      "compaction must not change probe results")
    // compacting an already-compact store is a no-op
    Search.compactIndex(spark, store)
    assert(Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq === probe)
  }

  test("scores match a driver-side recomputation of the rational-idf BM25") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = docs.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    def score(terms: Seq[String], doc: Seq[String]): Double = {
      val dl = doc.length
      terms.flatMap { t =>
        val tf = doc.count(_ == t).toLong
        if (tf == 0) None else {
          val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
          val norm = 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
          Some(math.round(idf * (tf * 2.2) / (tf + norm) * 1e6))
        }
      }.sum / 1e6
    }
    val queryTerms = Map(
      "q1" -> Seq("vector", "hash"),
      "q2" -> Seq("merge", "join"),
      "q3" -> Seq("slow", "query", "scan"))
    val docMap = docs.toMap
    out.collect().foreach { r =>
      val expect = BigDecimal(score(queryTerms(r.getString(0)), docMap(r.getLong(2))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === expect,
        s"${r.getString(0)}/${r.getLong(2)}: got ${r.getDouble(3)}, want $expect")
    }
  }
}

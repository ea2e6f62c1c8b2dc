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
  }

  test("persisted index: append equals a full rebuild, probe-for-probe") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val seed = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    val appended = java.nio.file.Files.createTempDirectory("graft-bm25-app").toString
    Search.buildIndex(seed, appended)
    Search.appendToIndex(batch, appended)
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-bm25-reb").toString
    Search.buildIndex(docs, rebuilt)
    // stats totals identical by construction
    val sa = spark.read.parquet(Search.statsPath(appended)).collect().head
    val sr = spark.read.parquet(Search.statsPath(rebuilt)).collect().head
    assert((sa.getLong(0), sa.getLong(1)) === (sr.getLong(0), sr.getLong(1)))
    // probes bit-identical: postings row set and stats agree, and scoring
    // is a pure function of both
    val pa = Search.probeIndex(spark, appended, Search.QueryTerms).collect().toSeq
    val pr = Search.probeIndex(spark, rebuilt, Search.QueryTerms).collect().toSeq
    assert(pa === pr, "append+probe must equal rebuild+probe")
    assert(pa.nonEmpty)
  }

  test("persisted index: an empty append batch is a no-op, not a crash") {
    import spark.implicits._
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val store = java.nio.file.Files.createTempDirectory("graft-bm25-empty").toString
    Search.buildIndex(docs, store)
    val before = Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq
    Search.appendToIndex(docs.where(col("doc_id") < 0), store)
    val after = Search.probeIndex(spark, store, Search.QueryTerms).collect().toSeq
    assert(after === before, "an empty append must leave the index unchanged")
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

package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** N-gram mining invariants: counts match a driver-side recount, the
  * top-k cut is the true maximum, and flagged boilerplate docs really
  * contain a mined shingle.
  */
class NgramsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs = graft.sources.Tables.documents(spark, sfDir)
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)

  private def shinglesOf(toks: Seq[String]): Seq[String] =
    if (toks.length < 5) Seq.empty
    else toks.sliding(5).map(_.mkString(" ")).toSeq

  test("top-ngram counts match a driver-side recount and the cut is maximal") {
    val mined = Ngrams.topNgrams(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(mined.length === 20)
    val all = docs.flatMap { case (id, ts) => shinglesOf(ts).map(id -> _) }
    val occ = all.groupBy(_._2).map { case (s, xs) =>
      s -> (xs.length.toLong, xs.map(_._1).distinct.length.toLong)
    }
    mined.foreach { case (_, shingle, nOcc, nDocs) =>
      assert(occ(shingle) === ((nOcc, nDocs)), s"count mismatch for '$shingle'")
    }
    // nothing outside the mined set may beat the mined minimum
    // (ties at the boundary break lexicographically)
    val minMined = mined.map(_._3).min
    val outside = occ.view.filterKeys(s => !mined.exists(_._2 == s))
    assert(outside.forall(_._2._1 <= minMined))
  }

  test("flagged boilerplate docs contain mined shingles with matching hit counts") {
    val minedTop10 = Ngrams.topNgrams(spark, sfDir, 10).collect().map(_.getString(1)).toSet
    val flagged = Ngrams.boilerplateDocs(spark, sfDir).collect()
    assert(flagged.nonEmpty, "expected at least one boilerplate hit at sf0.001")
    val byId = docs.toMap
    flagged.foreach { r =>
      val hits = shinglesOf(byId(r.getLong(0))).filter(minedTop10)
      assert(hits.nonEmpty)
      assert(r.getLong(2) === hits.length.toLong, "n_boiler_hits")
      assert(r.getLong(1) === hits.distinct.length.toLong, "n_boiler_shingles")
      assert(r.getBoolean(3) === (hits.length >= 2), "is_boilerplate flag")
    }
  }
}

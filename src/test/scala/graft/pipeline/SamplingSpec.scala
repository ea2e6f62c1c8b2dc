package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Invariants for deterministic sampling: reproducibility, stability under
  * corpus growth, exact stratified quotas, and the hash-smallest selection
  * property the two-phase plan must preserve.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("hash sample is reproducible and membership is stable under growth") {
    val s1 = Sampling.hashSample(spark, sfDir).collect().map(_.getLong(0))
    val s2 = Sampling.hashSample(spark, sfDir).collect().map(_.getLong(0))
    assert(s1.sameElements(s2))
    // a doc's membership is a pure function of doc_id: sampling a PREFIX
    // of the corpus yields exactly the sample's intersection with it
    val all = Sampling.hashSample(spark, sfDir)
      .where(col("doc_id") < 250).collect().map(_.getLong(0)).toSet
    val prefix = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") < 250)
    val direct = prefix
      .where(Sampling.sampleHash(col("doc_id")) % 100 < 5)
      .collect().map(_.getLong(0)).toSet
    assert(direct === all)
  }

  test("hash sample rate lands near pct/mod") {
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    val k = Sampling.hashSample(spark, sfDir).count()
    // 5% of 500 — wide deterministic band, pinned data
    assert(k >= 10 && k <= 45, s"sampled $k of $n")
  }

  test("split report partitions the corpus and matches the hash-slot rule") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def splitOf(id: Long): String = {
      val slot = Sampling.sampleHashJvm(id) % 100
      if (slot < 90) "train" else if (slot < 95) "val" else "test"
    }
    val want = docs.groupBy(d => (d._2, splitOf(d._1)))
      .map { case ((src, sp), xs) => (src, sp, xs.length.toLong, xs.map(_._3).sum) }
      .toSet
    val got = Sampling.sampleSplit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
    // a partition: every doc in exactly one split
    assert(got.toSeq.map(_._3).sum === docs.length.toLong)
  }

  test("mixture sample respects per-source rates; unlisted sources are dropped") {
    // every kept row's slot must sit under its own source's rate, and a
    // full-rate source keeps everything while a rate-0 one keeps nothing
    val rates = Map("src0" -> 100, "src1" -> 0, "src2" -> 50)
    val out = Sampling.mixtureSample(spark, sfDir, rates).cache()
    assert(out.where(col("source") === "src1").count() === 0)
    assert(!out.select("source").distinct().collect()
      .exists(r => !rates.contains(r.getString(0))),
      "sources absent from the rate map must be dropped")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    assert(out.where(col("source") === "src0").count() ===
      docs.where(col("source") === "src0").count(),
      "rate 100 must keep the whole source")
    // rate-50 kept set == hashSample membership restricted to that source
    val kept = out.where(col("source") === "src2").collect().map(_.getLong(0)).toSet
    val direct = docs.where(col("source") === "src2")
      .where(Sampling.sampleHash(col("doc_id")) % 100 < 50)
      .collect().map(_.getLong(0)).toSet
    assert(kept === direct)
  }

  test("stratified sample hits the exact per-stratum quota") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val expected = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> math.ceil(0.1 * r.getLong(1)).toLong).toMap
    val got = Sampling.stratifiedSample(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("stratified selection takes the hash-smallest rows per stratum") {
    val sample = Sampling.stratifiedSample(spark, sfDir)
      .select(col("lang"), col("h"), col("doc_id"))
    val all = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), Sampling.sampleHash(col("doc_id")).as("h"), col("doc_id"))
    val unsampled = all.join(sample.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxIn = sample.groupBy("lang").agg(max(struct(col("h"), col("doc_id"))).as("mx"))
    val minOut = unsampled.groupBy("lang").agg(min(struct(col("h"), col("doc_id"))).as("mn"))
    val bad = maxIn.join(minOut, "lang").where(col("mx") > col("mn")).count()
    assert(bad === 0, "every selected (h, doc_id) must precede every unselected one")
  }

  test("quotas stay exact on a skewed planted frame (boundary remainder path)") {
    // one giant stratum and one tiny one — exercises the boundary-bucket
    // remainder logic on a stratum that spans many buckets
    val rows = (0L until 2000L).map(i => (i, "big")) ++ Seq((90001L, "small"), (90002L, "small"))
    val df = rows.toDF("doc_id", "lang")
    val out = Sampling.stratifiedSampleOf(df, frac = 0.25)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("big" -> 500L, "small" -> 1L))
  }
}

package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

class LanguageModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val scored =
    LanguageModel.perplexityProxy(spark, sfDir).cache()

  test("reference-slice documents have zero unseen transitions and non-negative bits") {
    // every reference doc's bigrams are in the model by construction
    assert(scored.filter(col("doc_id") % 3 === 0 && col("n_unseen") > 0).count() === 0)
    assert(scored.filter(col("total_bits") < 0).count() === 0)
    assert(scored.count() > 0)
  }

  test("reference documents score as more fluent than out-of-model documents") {
    val Array(refMean, restMean) = scored
      .groupBy((col("doc_id") % 3 === 0).as("ref"))
      .agg(avg(col("milli_bits_per_trans")).as("m"))
      .orderBy(col("ref").desc)
      .collect().map(_.getDouble(1))
    assert(refMean < restMean,
      s"reference mean surprisal $refMean should be below non-reference $restMean")
  }

  test("plan: no cartesian product beyond the broadcast 1-row vocab join") {
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = LanguageModel.perplexityProxy(s, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"model joins must stay equi-joins:\n$plan")
  }

  private lazy val triScored =
    LanguageModel.stupidBackoff(spark, sfDir).cache()

  test("trigram: reference docs never back off and all bits are non-negative") {
    // every reference doc's trigrams are in the model by construction, so
    // the c3 > 0 clause always fires and the backoff counter stays 0
    assert(triScored.filter(col("doc_id") % 3 === 0 && col("n_backoff") > 0)
      .count() === 0)
    assert(triScored.filter(col("total_bits") < 0).count() === 0)
    assert(triScored.count() > 0)
  }

  test("trigram: reference documents score as more fluent than the rest") {
    val Array(refMean, restMean) = triScored
      .groupBy((col("doc_id") % 3 === 0).as("ref"))
      .agg(avg(col("milli_bits_per_trans")).as("m"))
      .orderBy(col("ref").desc)
      .collect().map(_.getDouble(1))
    assert(refMean < restMean,
      s"reference mean surprisal $refMean should be below non-reference $restMean")
  }

  test("trigram: sharper than the bigram model on the reference slice") {
    // a higher-order model with exact hits should assign the reference
    // slice FEWER mean bits than the add-one bigram proxy — the fidelity
    // claim that justifies the upgrade, asserted, not narrated
    val tri = triScored.filter(col("doc_id") % 3 === 0)
      .agg(avg(col("milli_bits_per_trans"))).collect().head.getDouble(0)
    val bi = scored.filter(col("doc_id") % 3 === 0)
      .agg(avg(col("milli_bits_per_trans"))).collect().head.getDouble(0)
    assert(tri < bi, s"trigram ref mean $tri should be below bigram $bi")
  }

  test("buckets: exact thirds per language, head strictly more fluent than tail") {
    val b = LanguageModel.perplexityBuckets(spark, sfDir).cache()
    val byLang = b.collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val m = rows.map(r => r._2 -> r).toMap
      assert(m.keySet === Set("head", "middle", "tail"), s"$lang buckets")
      // integer thirds: sizes differ by at most 1
      val sizes = rows.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang sizes $sizes")
      // score bands are ordered and non-overlapping (total order split)
      assert(m("head")._5 <= m("middle")._4, s"$lang head/middle overlap")
      assert(m("middle")._5 <= m("tail")._4, s"$lang middle/tail overlap")
    }
    assert(byLang.nonEmpty)
  }

  test("approx buckets: sketch cutoffs stay inside the rank window and bracket the split") {
    val rows = LanguageModel.perplexityBucketsApprox(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, p33, p67) = (r.getString(0), r.getDouble(2), r.getDouble(3))
      assert(r.getBoolean(4) && r.getBoolean(5),
        s"$lang sketch audit flipped: $r")
      assert(p33 <= p67, s"$lang cutoffs out of order")
    }
    // the approx split agrees with the exact thirds at the boundary: the
    // exact head's max score never exceeds the exact middle's min, and
    // the approx cutoff lies between the head band and the tail band
    val exact = LanguageModel.perplexityBuckets(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    rows.foreach { r =>
      val bands = exact(r.getString(0)).map(b => b._2 -> b).toMap
      assert(r.getDouble(2) >= bands("head")._3.toDouble &&
        r.getDouble(2) <= bands("tail")._4.toDouble,
        s"${r.getString(0)} p33 cutoff outside the score range of the split")
    }
  }

  test("trigram plan: equi-joins only, no cartesian product") {
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = LanguageModel.stupidBackoff(s, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"model joins must stay equi-joins:\n$plan")
  }
}

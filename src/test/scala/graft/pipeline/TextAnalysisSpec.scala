package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.testkit.SparkTestSession

/** Invariants for the text-analysis operators (exact outputs are pinned by
  * the DuckDB oracle; these pin scale-independent semantics).
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val nDocs = Tables.documents(spark, sfDir).count()

  test("stats: one row per doc; ratios and counts internally consistent") {
    val st = TextAnalysis.stats(spark, sfDir).cache()
    assert(st.count() === nDocs)
    assert(st.where(col("n_tokens") < 1).count() === 0)
    assert(st.where(col("n_distinct_tokens") > col("n_tokens")).count() === 0)
    assert(st.where(col("distinct_ratio") < 0 || col("distinct_ratio") > 1).count() === 0)
    // n_chars = n_tokens - 1 separators + sum of token lengths
    assert(st.where(col("n_chars_calc") <
      col("n_tokens") - 1 + col("n_tokens")).count() === 0)
  }

  test("quality: flag is exactly the conjunction of its three published rules") {
    val q = TextAnalysis.quality(spark, sfDir).cache()
    val mismatch = q.where(
      col("is_quality") =!= (col("n_tokens").between(10, 2000) &&
        col("stopword_ratio") >= 0.01 && col("distinct_ratio") >= 0.3)).count()
    assert(mismatch === 0)
  }

  test("langId: prediction is a closed label set and argmax-consistent") {
    val l = TextAnalysis.langId(spark, sfDir).cache()
    assert(l.count() === nDocs)
    val labels = Seq("en", "fr", "es", "de", "zh", "unknown")
    assert(l.where(!col("predicted_lang").isin(labels: _*)).count() === 0)
    // a doc predicted 'en' must have s_en >= every other score
    val bad = l.where(col("predicted_lang") === "en" && !col("has_cjk") &&
      (col("s_en") < col("s_fr") || col("s_en") < col("s_es") ||
        col("s_en") < col("s_de"))).count()
    assert(bad === 0)
  }

  test("fingerprint is deterministic and order-insensitive across duplicate bags") {
    val fp = TextAnalysis.fingerprint(spark, sfDir)
    // identical texts must share fingerprints
    val docs = Tables.documents(spark, sfDir)
    val joined = docs.as("d").join(fp.as("f"), col("d.doc_id") === col("f.doc_id"))
      .select(col("text"), col("fp"))
    val conflictingTexts = joined.groupBy("text")
      .agg(countDistinct("fp").as("nfp")).where(col("nfp") > 1).count()
    assert(conflictingTexts === 0)
  }

  test("token counting: BPE-ish regex always >= whitespace tokens on this corpus") {
    val tc = TextAnalysis.tokenCount(spark, sfDir).cache()
    assert(tc.count() === nDocs)
    // the subword regex splits punctuation/number boundaries that
    // whitespace tokenization keeps glued — it can never merge tokens
    assert(tc.where(col("n_bpe_tokens") < col("n_ws_tokens")).count() === 0)
    assert(tc.where(col("n_bpe_tokens") < 1).count() === 0)
  }
}

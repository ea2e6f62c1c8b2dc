package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token statistics, quality scoring, language ID
  * (n-gram/stopword heuristic), and document fingerprinting. All pure
  * column expressions (whole-stage codegen, no UDFs), each with a DuckDB
  * oracle; tokenization = single-space split in both dialects.
  *
  * At 100 TB these are embarrassingly parallel single-scan map operations —
  * no shuffle at all except the fingerprint dedup group.
  */
object TextAnalysis {

  private val tokens = split(col("text"), " ")

  /** Per-document token statistics. */
  def stats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        size(tokens).as("n_tokens"),
        size(array_distinct(tokens)).as("n_distinct_tokens"),
        round(size(array_distinct(tokens)).cast("double") / size(tokens), 4).as("distinct_ratio"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") / size(tokens), 4)
          .as("avg_token_len"))
      .orderBy("doc_id")

  val statsSql: String =
    """SELECT doc_id,
      |  length(text) AS n_chars_calc,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
      |  round(len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')), 4) AS distinct_ratio,
      |  round(length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')), 4) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  /** Quality scoring: length bounds + stopword density + vocabulary
    * diversity → keep/drop flag (the standard pre-training corpus filters,
    * cf. C4/Gopher-style rules).
    */
  private def stopCnt = {
    val stopSet = Stopwords.map(w => s"'$w'").mkString(", ")
    size(expr(s"filter(split(text, ' '), x -> x IN ($stopSet))"))
  }

  /** The quality predicate as a plain Column over a documents row — THE
    * single definition ([[quality]] reports it; [[Curation.curate]]
    * filters on it inline so quality stays a map-only predicate on the
    * scan, never a corpus-sized join against the quality report).
    */
  def isQualityCol: org.apache.spark.sql.Column =
    size(tokens).between(10, 2000) &&
      (stopCnt.cast("double") / size(tokens)) >= 0.01 &&
      (size(array_distinct(tokens)).cast("double") / size(tokens)) >= 0.3

  def quality(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(tokens))
      .withColumn("stop_cnt", stopCnt)
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("stop_cnt").cast("double") / col("n_tokens"), 4).as("stopword_ratio"),
        round(size(array_distinct(tokens)).cast("double") / size(tokens), 4).as("distinct_ratio"),
        isQualityCol.as("is_quality"))
      .orderBy("doc_id")

  val qualitySql: String = {
    val stopSet = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  round(len(list_filter(string_split(text, ' '), x -> x IN ($stopSet))) * 1.0
       |        / len(string_split(text, ' ')), 4) AS stopword_ratio,
       |  round(len(list_distinct(string_split(text, ' '))) * 1.0
       |        / len(string_split(text, ' ')), 4) AS distinct_ratio,
       |  (len(string_split(text, ' ')) BETWEEN 10 AND 2000
       |   AND len(list_filter(string_split(text, ' '), x -> x IN ($stopSet))) * 1.0
       |       / len(string_split(text, ' ')) >= 0.01
       |   AND len(list_distinct(string_split(text, ' '))) * 1.0
       |       / len(string_split(text, ' ')) >= 0.3) AS is_quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Language-ID heuristic: CJK script detection by codepoint range, then
    * per-language stopword scoring with a deterministic argmax. (The
    * synthetic corpus shares one vocabulary across its `lang` labels, so
    * this checks the OPERATOR — identical prediction in engine and oracle —
    * not label recovery.)
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    def score(words: Seq[String]) = {
      val set = words.map(w => s"'$w'").mkString(", ")
      size(expr(s"filter(split(text, ' '), x -> x IN ($set))"))
    }
    val en = score(Seq("the", "a", "of", "and", "is"))
    val fr = score(Seq("le", "la", "les", "et", "est"))
    val es = score(Seq("el", "la", "los", "y", "es"))
    val de = score(Seq("der", "die", "das", "und", "ist"))
    Tables.documents(spark, sfDir)
      .withColumn("has_cjk", col("text").rlike("[\\u4e00-\\u9fff]"))
      .withColumn("s_en", en).withColumn("s_fr", fr)
      .withColumn("s_es", es).withColumn("s_de", de)
      .withColumn("predicted_lang",
        when(col("has_cjk"), lit("zh"))
          .when(greatest(col("s_en"), col("s_fr"), col("s_es"), col("s_de")) === 0, lit("unknown"))
          .when(col("s_en") >= greatest(col("s_fr"), col("s_es"), col("s_de")), lit("en"))
          .when(col("s_fr") >= greatest(col("s_es"), col("s_de")), lit("fr"))
          .when(col("s_es") >= col("s_de"), lit("es"))
          .otherwise(lit("de")))
      .select("doc_id", "has_cjk", "s_en", "s_fr", "s_es", "s_de", "predicted_lang")
      .orderBy("doc_id")
  }

  val langIdSql: String = {
    def score(words: Seq[String]) = {
      val set = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), x -> x IN ($set)))"
    }
    val (en, fr, es, de) = (
      score(Seq("the", "a", "of", "and", "is")),
      score(Seq("le", "la", "les", "et", "est")),
      score(Seq("el", "la", "los", "y", "es")),
      score(Seq("der", "die", "das", "und", "ist")))
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS has_cjk,
       |    $en AS s_en, $fr AS s_fr, $es AS s_es, $de AS s_de
       |  FROM documents)
       |SELECT doc_id, has_cjk, s_en, s_fr, s_es, s_de,
       |  CASE WHEN has_cjk THEN 'zh'
       |       WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'unknown'
       |       WHEN s_en >= greatest(s_fr, s_es, s_de) THEN 'en'
       |       WHEN s_fr >= greatest(s_es, s_de) THEN 'fr'
       |       WHEN s_es >= s_de THEN 'es'
       |       ELSE 'de' END AS predicted_lang
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** GPT-2-style pre-tokenizer regex: letter runs, single digits, and
    * punctuation runs each count as one (pre-merge) token — the standard
    * upper bound used for corpus token budgeting when the real BPE merges
    * aren't loaded. Identical pattern in Spark (Java regex) and DuckDB (RE2).
    */
  private val BpeIshPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"

  /** Token counting: whitespace tokens vs BPE-ish subword-boundary tokens
    * per document, plus corpus-budgeting byte length. Single scan, no
    * shuffle — at 100 TB this is the map-only pass that sizes a training
    * run.
    */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(tokens).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpeIshPattern), lit(0)))
          .as("n_bpe_tokens"),
        octet_length(col("text")).as("n_bytes"))
      .orderBy("doc_id")

  val tokenCountSql: String =
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_ws_tokens,
       |  len(regexp_extract_all(text, '$BpeIshPattern')) AS n_bpe_tokens,
       |  octet_length(encode(text)) AS n_bytes
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Document fingerprint: md5 over the sorted distinct token bag — an
    * order-insensitive content hash (the cross-dialect-stable stand-in for
    * a rolling hash; binary token order matches between Spark UTF8 and
    * DuckDB default collation for this corpus).
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(tokens))).cast("binary")).as("fp"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Top-k terms per document by TF-IDF. The score is the rational form
    * `tf · N / df` (one integer product, one double division — no
    * transcendentals, so both engines compute the identical double and the
    * oracle hash-matches; ln-idf would rank identically since ln is
    * monotone in N/df and tf ≥ 1 scales positively... strictly: the
    * rational form is its own well-defined relevance score, used here for
    * cross-engine determinism).
    *
    * Shape at scale: tf = one shuffle on (doc, term) with map-side combine;
    * df = one shuffle on term (partial-agg'd); corpus size N broadcast;
    * per-doc top-k via WindowGroupLimit (rank pushdown, no full sort of
    * the scored set).
    */
  def tfidfTopTerms(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val tf = docs.select(col("doc_id"), explode(tokens).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(total))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), round(col("score"), 4).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  def tfidfTopTermsSql(k: Int = 5): String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, term, CAST(tf * n_docs AS DOUBLE) / df AS score
       |  FROM tf JOIN dft USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |                               ORDER BY score DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, rank, term, round(score, 4) AS tfidf
       |FROM ranked WHERE rank <= $k ORDER BY doc_id, rank""".stripMargin

  /** Per-language document-length distribution — the corpus-profiling
    * numbers a length-filter stage is tuned from — in the SCALE form:
    * `approx_percentile` (Greenwald–Khanna summary, partial-aggregable,
    * bounded memory per group) is the aggregate that actually runs at
    * 100 TB, where the exact form's holistic buffer (all of a language's
    * values in one aggregation buffer) is a task OOM on corpus-sized
    * groups.
    *
    * Oracle contract (the `events_approx_profile` pattern): sketch values
    * are engine-specific, so the hash gate checks the EXACT interpolated
    * quantiles (Spark `percentile` ≡ DuckDB `quantile_cont`: index
    * p·(n−1), linear interpolation) plus one ERROR-BOUND audit boolean per
    * sketch. The sketch's guarantee is a RANK bound (GK summary: rank
    * error ≤ max(1, n/accuracy)), not a value bound — adjacent order
    * statistics can be arbitrarily far apart in value — so the audit is a
    * rank window: approx pXX must lie within [exact p(XX−5), exact
    * p(XX+5)], a ±5-percentile-point corridor the 1e-4 relative rank error
    * sits far inside. On groups smaller than 1000 the corridor is replaced
    * by a [min, max] membership check: there the summary never compresses
    * (it IS exact, returning the order statistic at rank ⌈p·n⌉), but that
    * rank CONVENTION differs from the interpolated index p·(n−1) by up to
    * one order statistic — more than a ±5-point corridor spans when
    * 0.05·n < 1ish — so a corridor audit would flag healthy sketches on
    * tiny groups. At scale (the audit's purpose) every group takes the
    * corridor path. A sketch drifting out flips the boolean and fails the
    * gate. The exact aggregates exist here as the in-query audit; the
    * 100 TB deployment emits the sketch columns alone and drops the audit.
    */
  def lengthQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    def ex(p: Double): Column = percentile(col("n_chars"), lit(p))
    def ap(p: Double): Column = percentile_approx(col("n_chars"), lit(p), lit(10000))
    def ok(a: Column, lo: Column, hi: Column): Column =
      a.between(col("mn"), col("mx")) &&
        (col("n_docs") < 1000 || a.between(lo, hi))
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).cast("double").as("mn"),
        max(col("n_chars")).cast("double").as("mx"),
        ex(0.25).as("e25"), ex(0.50).as("e50"), ex(0.75).as("e75"), ex(0.95).as("e95"),
        ex(0.20).as("lo25"), ex(0.30).as("hi25"),
        ex(0.45).as("lo50"), ex(0.55).as("hi50"),
        ex(0.70).as("lo75"), ex(0.80).as("hi75"),
        ex(0.90).as("lo95"),
        ap(0.25).as("a25"), ap(0.50).as("a50"), ap(0.75).as("a75"), ap(0.95).as("a95"))
      .select(col("lang"), col("n_docs"),
        round(col("e25"), 2).as("p25"), round(col("e50"), 2).as("p50"),
        round(col("e75"), 2).as("p75"), round(col("e95"), 2).as("p95"),
        ok(col("a25"), col("lo25"), col("hi25")).as("p25_sketch_ok"),
        ok(col("a50"), col("lo50"), col("hi50")).as("p50_sketch_ok"),
        ok(col("a75"), col("lo75"), col("hi75")).as("p75_sketch_ok"),
        ok(col("a95"), col("lo95"), col("mx")).as("p95_sketch_ok"))
      .orderBy("lang")
  }

  val lengthQuantilesSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  round(quantile_cont(n_chars, 0.25), 2) AS p25,
      |  round(quantile_cont(n_chars, 0.50), 2) AS p50,
      |  round(quantile_cont(n_chars, 0.75), 2) AS p75,
      |  round(quantile_cont(n_chars, 0.95), 2) AS p95,
      |  TRUE AS p25_sketch_ok, TRUE AS p50_sketch_ok,
      |  TRUE AS p75_sketch_ok, TRUE AS p95_sketch_ok
      |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin
}

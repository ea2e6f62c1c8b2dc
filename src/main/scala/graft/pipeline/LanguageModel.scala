package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** N-gram language-model quality scoring — the CCNet-shaped filter
  * (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  * from Web Crawl Data": rank crawl documents by the perplexity of a
  * KenLM n-gram model trained on a clean reference corpus; public
  * method). The deterministic re-expression: a bigram count model trained
  * IN the engine on a reference slice, and a per-document surprisal in
  * integer BITS so the DuckDB oracle reproduces every value exactly —
  * floating log-probabilities would drift across engines, bit lengths
  * cannot (`ilog2(n) = length(bin(n)) − 1`, the [[ImportanceSampling]]
  * estimator discipline).
  *
  * Per transition (u → v), with add-one-style smoothing over a vocabulary
  * of V = |distinct reference tokens| + 1:
  *   surprisal(u,v) = ilog2(c1(u) + V) − ilog2(c2(u,v) + 1)   [≥ 0 bits]
  * c1(u) = reference occurrences of u as a bigram prefix, c2(u,v) =
  * reference bigram count. An unseen prefix costs ilog2(V) bits — the
  * model's maximum — so gibberish scores high (bad) and fluent reference-
  * like text scores low, exactly the CCNet ranking direction.
  *
  * Scale shape: this is the KenLM storage model distributed — the count
  * tables ARE the artifact. c2/c1 are corpus-vocabulary-bounded tables
  * built by map-side-combined aggregates over the reference slice (one
  * scan + one derived aggregate; V is a 1-row aggregate cross-joined in).
  * Scoring is equi-joins of the (doc,u,v)-grain counts against c2/c1 —
  * shuffles keyed on the bigram/prefix, never any pairwise blowup; a hot
  * bigram has ONE row on the model side, so join fan-out is the doc
  * side's own row count. The per-doc fold is one aggregate.
  */
object LanguageModel {

  /** Deterministic clean-reference slice (the "Wikipedia side" of CCNet). */
  private def isReference(docId: Column): Column = docId % 3 === 0

  private def ilog2(n: Column): Column = length(bin(n)) - 1

  /** One row per bigram occurrence: (doc_id, u, v). */
  private def bigramRows(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        (1 until t.length).iterator.map(i => (id, t(i - 1), t(i)))
      }
      .toDF("doc_id", "u", "v")
  }

  /** Score every document's mean surprisal under the reference bigram
    * model. Lower = more reference-like (the CCNet keep signal).
    */
  def perplexityProxy(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val refDocs = docs.filter(isReference(col("doc_id")))

    // the model: bigram counts, prefix counts derived from them, vocab+1
    val c2 = bigramRows(refDocs).groupBy("u", "v").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("u").agg(sum(col("c2")).cast("long").as("c1"))
    val vocab = refDocs
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg((countDistinct(col("tok")) + 1).cast("long").as("vsize"))

    val scored = bigramRows(docs)
      .groupBy("doc_id", "u", "v").agg(count(lit(1)).as("cnt"))
      .join(c2, Seq("u", "v"), "left")
      .join(c1, Seq("u"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("cnt"),
        (ilog2(coalesce(col("c1"), lit(0L)) + col("vsize")) -
          ilog2(coalesce(col("c2"), lit(0L)) + 1)).cast("long").as("bits"),
        col("c2").isNull.as("unseen"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).cast("long").as("n_trans"),
        sum(col("cnt") * col("bits")).cast("long").as("total_bits"),
        sum(when(col("unseen"), col("cnt")).otherwise(0L))
          .cast("long").as("n_unseen"))

    scored.select(col("doc_id"), col("n_trans"), col("total_bits"),
        col("n_unseen"),
        // EXACT integer milli-bits (total_bits*1000 div n_trans): a
        // rounded double ratio flaked on representation ties (4.0375
        // rounds differently as a decimal vs a binary double — seen live
        // at sf0.1 on the trigram sibling), integer division cannot
        expr("total_bits * 1000 div n_trans").as("milli_bits_per_trans"))
      .orderBy("doc_id")
  }

  /** One row per trigram occurrence: (doc_id, u, v, w). */
  private def trigramRows(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        (2 until t.length).iterator.map(i => (id, t(i - 2), t(i - 1), t(i)))
      }
      .toDF("doc_id", "u", "v", "w")
  }

  /** Trigram scoring with STUPID BACKOFF (Brants et al., "Large Language
    * Models in Machine Translation", 2007 — the public web-scale n-gram
    * smoothing: no discounting, back off to the lower order with a fixed
    * multiplicative penalty). The integer-bits re-expression uses
    * α = 1/2 per backed-off level, i.e. a flat +1 bit — which keeps every
    * score an exact integer both engines reproduce bit-for-bit:
    *
    *   bits(u,v,w) =
    *     c3(u,v,w) > 0 : ilog2(c2p(u,v)) − ilog2(c3)       [trigram hit]
    *     c2(v,w)   > 0 : 1 + ilog2(c1p(v)) − ilog2(c2)     [backoff 1]
    *     c1(w)     > 0 : 2 + ilog2(T) − ilog2(c1(w))       [backoff 2]
    *     else          : 2 + ilog2(T + 1)                  [unseen word]
    *
    * c3 = reference trigram count, c2p = reference count of (u,v) as a
    * TRIGRAM PREFIX (so c3 ≤ c2p and the bits are ≥ 0 by construction),
    * c2 = reference bigram count, c1p = reference count of v as a bigram
    * prefix, c1 = reference unigram count, T = reference token total.
    * Every numerator/denominator pair nests (an occurrence of the longer
    * n-gram is an occurrence of its prefix), so no clause can go
    * negative.
    *
    * This closes most of the fidelity gap to CCNet's 5-gram KenLM while
    * keeping the [[perplexityProxy]] disciplines: model tables are
    * vocabulary-bounded aggregates of ONE reference-slice scan family,
    * scoring is equi-joins at the (doc,u,v,w) grain (a hot n-gram has one
    * model-side row, so fan-out is the doc side's own row count), T rides
    * as a broadcast 1-row frame, and the per-doc fold is one aggregate.
    */
  def stupidBackoff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val refDocs = docs.filter(isReference(col("doc_id")))

    val tri = trigramRows(refDocs)
    val c3 = tri.groupBy("u", "v", "w").agg(count(lit(1)).cast("long").as("c3"))
    val c2p = c3.groupBy("u", "v").agg(sum(col("c3")).cast("long").as("c2p"))
    // bigramRows emits (first, second) as (u, v); the backoff clauses key
    // on a trigram's LAST two tokens, so rename to the (v, w) grain
    val c2 = bigramRows(refDocs)
      .select(col("u").as("v"), col("v").as("w"))
      .groupBy("v", "w").agg(count(lit(1)).cast("long").as("c2"))
    val c1p = c2.groupBy("v").agg(sum(col("c2")).cast("long").as("c1p"))
    val c1 = refDocs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("c1"))
    val totals = c1.agg(sum(col("c1")).cast("long").as("t_tokens"))

    // doc-side bigram counts renamed to the model's (v, w) key: the
    // backoff clauses condition on the LAST two / last one token(s)
    val scored = trigramRows(docs)
      .groupBy("doc_id", "u", "v", "w").agg(count(lit(1)).as("cnt"))
      .join(c3, Seq("u", "v", "w"), "left")
      .join(c2p, Seq("u", "v"), "left")
      .join(c2, Seq("v", "w"), "left")
      .join(c1p, Seq("v"), "left")
      .join(c1, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("cnt"),
        when(coalesce(col("c3"), lit(0L)) > 0,
            ilog2(col("c2p")) - ilog2(col("c3")))
          .when(coalesce(col("c2"), lit(0L)) > 0,
            lit(1) + ilog2(col("c1p")) - ilog2(col("c2")))
          .when(coalesce(col("c1"), lit(0L)) > 0,
            lit(2) + ilog2(col("t_tokens")) - ilog2(col("c1")))
          .otherwise(lit(2) + ilog2(col("t_tokens") + 1))
          .cast("long").as("bits"),
        when(coalesce(col("c3"), lit(0L)) > 0, 0L).otherwise(1L).as("backed"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).cast("long").as("n_trans"),
        sum(col("cnt") * col("bits")).cast("long").as("total_bits"),
        sum(col("cnt") * col("backed")).cast("long").as("n_backoff"))

    scored.select(col("doc_id"), col("n_trans"), col("total_bits"),
        col("n_backoff"),
        // exact integer milli-bits — see [[perplexityProxy]]
        expr("total_bits * 1000 div n_trans").as("milli_bits_per_trans"))
      .orderBy("doc_id")
  }

  /** CCNet's actual partitioning step: split each language's documents
    * into HEAD / MIDDLE / TAIL thirds by LM score (Wenzek et al. §4.3 —
    * the head is the most reference-like third, what the paper trains
    * on). Thirds are integer-exact (`rank·3 ≤ n` / `≤ 2n`) over a total
    * order (score, then doc_id — the deterministic tie-break), so both
    * engines bucket identically; the output is the per-(lang, bucket)
    * census with score bounds, the table a curation owner reads to pick
    * a cutoff.
    *
    * Scale shape: scoring is [[stupidBackoff]]; the bucketing adds one
    * lang-partitioned window (the per-language sort is the honest cost of
    * an exact quantile split — at corpus scale a deployment would switch
    * to approx_percentile cutoffs, trading exactness; this operator is
    * the exact contract) and a (lang × 3)-sized aggregate.
    */
  def perplexityBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
    val scored = stupidBackoff(spark, sfDir)
      .select(col("doc_id"), col("milli_bits_per_trans").as("score"))
      .join(docs, "doc_id")
    val w = Window.partitionBy("lang").orderBy(col("score"), col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("bucket",
        when(col("rn") * 3 <= col("n"), "head")
          .when(col("rn") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col("score")).cast("long").as("min_milli_bits"),
        max(col("score")).cast("long").as("max_milli_bits"))
      .orderBy("lang", "bucket")
  }

  def perplexityBucketsSql(): String =
    s"""WITH scored AS (SELECT doc_id, milli_bits_per_trans AS score
      |               FROM (${stupidBackoffSql()})),
      |joined AS (
      |  SELECT s.doc_id, s.score, d.lang
      |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
      |ranked AS (
      |  SELECT lang, score,
      |    row_number() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM joined),
      |bucketed AS (
      |  SELECT lang, score,
      |    CASE WHEN rn * 3 <= n THEN 'head'
      |         WHEN rn * 3 <= n * 2 THEN 'middle'
      |         ELSE 'tail' END AS bucket
      |  FROM ranked)
      |SELECT lang, bucket, count(*) AS n_docs,
      |  CAST(min(score) AS BIGINT) AS min_milli_bits,
      |  CAST(max(score) AS BIGINT) AS max_milli_bits
      |FROM bucketed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The 100 TB form of [[perplexityBuckets]]: per-language HEAD/MIDDLE
    * cutoffs from `approx_percentile` (Greenwald–Khanna, partial-
    * aggregable, bounded memory) instead of the exact window sort — the
    * deployment splits by `score ≤ cutoff` map-side after broadcasting
    * the (lang × 2)-sized cutoff table, no per-language total order ever
    * materializes. This entry gates that path with the established
    * sketch-with-audit contract ([[TextAnalysis.lengthQuantiles]] /
    * `events_approx_profile`): sketch values are engine-specific, so the
    * hash-gated columns are the EXACT interpolated cutoffs plus one
    * rank-window audit boolean per sketch — approx p33.3 must land
    * within [exact p28.3, exact p38.3] (±5 percentile points; the 1e-4
    * relative rank error sits far inside), with the [min, max]
    * membership fallback on groups < 1000 where the summary is exact but
    * its rank convention differs from the interpolated index. A sketch
    * drifting out flips the boolean and fails the gate. Bucket-count
    * corridors would be redundant: `count(score ≤ c)` is monotone in
    * `c`, so the cutoff corridor already bounds the census.
    */
  def perplexityBucketsApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
    val scored = stupidBackoff(spark, sfDir)
      .select(col("doc_id"), col("milli_bits_per_trans").as("score"))
      .join(docs, "doc_id")
    def ex(p: Double): Column = percentile(col("score"), lit(p))
    def ap(p: Double): Column = percentile_approx(col("score"), lit(p), lit(10000))
    def ok(a: Column, lo: Column, hi: Column): Column =
      a.between(col("mn"), col("mx")) &&
        (col("n_docs") < 1000 || a.between(lo, hi))
    val third = 1.0 / 3
    scored.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).cast("double").as("mn"),
        max(col("score")).cast("double").as("mx"),
        ex(third).as("e33"), ex(2 * third).as("e67"),
        ex(third - 0.05).as("lo33"), ex(third + 0.05).as("hi33"),
        ex(2 * third - 0.05).as("lo67"), ex(2 * third + 0.05).as("hi67"),
        ap(third).as("a33"), ap(2 * third).as("a67"))
      .select(col("lang"), col("n_docs"),
        round(col("e33"), 2).as("p33_cutoff"),
        round(col("e67"), 2).as("p67_cutoff"),
        ok(col("a33"), col("lo33"), col("hi33")).as("c33_sketch_ok"),
        ok(col("a67"), col("lo67"), col("hi67")).as("c67_sketch_ok"))
      .orderBy("lang")
  }

  def perplexityBucketsApproxSql(): String =
    s"""WITH scored AS (SELECT doc_id, milli_bits_per_trans AS score
      |               FROM (${stupidBackoffSql()})),
      |joined AS (
      |  SELECT s.score, d.lang
      |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id)
      |SELECT lang, count(*) AS n_docs,
      |  round(quantile_cont(score, 1.0/3), 2) AS p33_cutoff,
      |  round(quantile_cont(score, 2.0/3), 2) AS p67_cutoff,
      |  TRUE AS c33_sketch_ok, TRUE AS c67_sketch_ok
      |FROM joined GROUP BY 1 ORDER BY lang""".stripMargin

  def stupidBackoffSql(): String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tg AS (
      |  SELECT doc_id,
      |         unnest(list_transform(generate_series(1, len(t) - 2), i -> t[i])) AS u,
      |         unnest(list_transform(generate_series(1, len(t) - 2), i -> t[i+1])) AS v,
      |         unnest(list_transform(generate_series(1, len(t) - 2), i -> t[i+2])) AS w
      |  FROM toks WHERE len(t) >= 3),
      |bg AS (
      |  SELECT doc_id,
      |         unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS v,
      |         unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i+1])) AS w
      |  FROM toks WHERE len(t) >= 2),
      |c3 AS (SELECT u, v, w, CAST(count(*) AS BIGINT) AS c3 FROM tg
      |       WHERE doc_id % 3 = 0 GROUP BY 1, 2, 3),
      |c2p AS (SELECT u, v, CAST(sum(c3) AS BIGINT) AS c2p FROM c3 GROUP BY 1, 2),
      |c2 AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c2 FROM bg
      |       WHERE doc_id % 3 = 0 GROUP BY 1, 2),
      |c1p AS (SELECT v, CAST(sum(c2) AS BIGINT) AS c1p FROM c2 GROUP BY 1),
      |c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c1
      |       FROM (SELECT unnest(t) AS w FROM toks WHERE doc_id % 3 = 0)
      |       GROUP BY 1),
      |totals AS (SELECT CAST(sum(c1) AS BIGINT) AS t_tokens FROM c1),
      |dc AS (SELECT doc_id, u, v, w, count(*) AS cnt FROM tg GROUP BY 1, 2, 3, 4),
      |tr AS (
      |  SELECT dc.doc_id, dc.cnt,
      |    CASE
      |      WHEN coalesce(c3.c3, 0) > 0 THEN
      |        (length(bin(c2p.c2p)) - 1) - (length(bin(c3.c3)) - 1)
      |      WHEN coalesce(c2.c2, 0) > 0 THEN
      |        1 + (length(bin(c1p.c1p)) - 1) - (length(bin(c2.c2)) - 1)
      |      WHEN coalesce(c1.c1, 0) > 0 THEN
      |        2 + (length(bin(totals.t_tokens)) - 1) - (length(bin(c1.c1)) - 1)
      |      ELSE 2 + (length(bin(totals.t_tokens + 1)) - 1)
      |    END AS bits,
      |    CASE WHEN coalesce(c3.c3, 0) > 0 THEN 0 ELSE 1 END AS backed
      |  FROM dc
      |  LEFT JOIN c3 ON dc.u = c3.u AND dc.v = c3.v AND dc.w = c3.w
      |  LEFT JOIN c2p ON dc.u = c2p.u AND dc.v = c2p.v
      |  LEFT JOIN c2 ON dc.v = c2.v AND dc.w = c2.w
      |  LEFT JOIN c1p ON dc.v = c1p.v
      |  LEFT JOIN c1 ON dc.w = c1.w
      |  CROSS JOIN totals)
      |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_trans,
      |       CAST(sum(cnt * bits) AS BIGINT) AS total_bits,
      |       CAST(sum(cnt * backed) AS BIGINT) AS n_backoff,
      |       CAST(sum(cnt * bits) AS BIGINT) * 1000
      |         // CAST(sum(cnt) AS BIGINT) AS milli_bits_per_trans
      |FROM tr GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  def perplexityProxySql(): String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |         unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS u,
      |         unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i+1])) AS v
      |  FROM toks WHERE len(t) >= 2),
      |c2 AS (SELECT u, v, count(*) AS c2 FROM bg WHERE doc_id % 3 = 0 GROUP BY 1, 2),
      |c1 AS (SELECT u, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      |vocab AS (
      |  SELECT CAST(count(DISTINCT tok) + 1 AS BIGINT) AS vsize
      |  FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id % 3 = 0)),
      |dc AS (SELECT doc_id, u, v, count(*) AS cnt FROM bg GROUP BY 1, 2, 3),
      |tr AS (
      |  SELECT dc.doc_id, dc.cnt,
      |         (length(bin(coalesce(c1.c1, 0) + vocab.vsize)) - 1)
      |       - (length(bin(coalesce(c2.c2, 0) + 1)) - 1) AS bits,
      |         c2.c2 IS NULL AS unseen
      |  FROM dc
      |  LEFT JOIN c2 ON dc.u = c2.u AND dc.v = c2.v
      |  LEFT JOIN c1 ON dc.u = c1.u
      |  CROSS JOIN vocab)
      |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_trans,
      |       CAST(sum(cnt * bits) AS BIGINT) AS total_bits,
      |       CAST(sum(CASE WHEN unseen THEN cnt ELSE 0 END) AS BIGINT) AS n_unseen,
      |       CAST(sum(cnt * bits) AS BIGINT) * 1000
      |         // CAST(sum(cnt) AS BIGINT) AS milli_bits_per_trans
      |FROM tr GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
}

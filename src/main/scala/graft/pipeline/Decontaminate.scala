package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Benchmark decontamination: find corpus documents that share token
  * n-grams with an evaluation/benchmark set — the standard guard against
  * train/test contamination in a training-data pipeline (published form:
  * exact 13-gram overlap; `n` is a parameter here because the synthetic
  * docs are 10–100 tokens, and the default 8 keeps the check meaningful
  * at that length).
  *
  * The eval set is modeled as a deterministic id-slice of `documents`
  * (`doc_id % evalMod == evalRes`) — in production it would be a separate
  * small table; everything downstream treats the two sides opaquely, so
  * swapping in a real benchmark table is a one-line change.
  *
  * Scale design: inverted index, never a doc×doc comparison. ONE scan of
  * documents and ONE shuffle keyed on the n-gram build BOTH sides'
  * posting lists (a single grouped aggregation with side-filtered
  * collect_lists); lists longer than [[MaxNgramDf]] on either side are
  * dropped — boilerplate n-grams carry no contamination signal and would
  * otherwise create df_corpus × df_eval pair blowups per hot key (the
  * same Zipf guard as [[Dedup.MaxShingleDf]], mirrored in the oracle) —
  * so pair expansion is bounded by MaxNgramDf² per key and the pair
  * shuffle carries ids only.
  */
object Decontaminate {

  /** Published decontamination uses 13-grams on web-scale text; 8 fits the
    * 10–100-token synthetic docs while keeping exact-span semantics.
    */
  val DefaultN = 8

  /** Per-side document-frequency cap: an n-gram appearing in more docs
    * than this (on either side) is dropped from the overlap universe.
    */
  val MaxNgramDf = 20

  /** THE n-gram definition (flatMap producer and oracle CTE must agree):
    * tokens = split on single space keeping empties; < n tokens ⇒ the
    * whole text is the one n-gram; distinct per doc.
    */
  private def ngramsOf(text: String, n: Int): Array[String] = {
    val t = text.split(" ", -1)
    if (t.length >= n) t.sliding(n).map(_.mkString(" ")).toArray.distinct
    else Array(text)
  }

  private def ngramRows(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) => ngramsOf(text, n).iterator.map(g => (id, g)) }
      .toDF("doc_id", "ngram")
  }

  /** (corpus_id, eval_id, n_shared) for every corpus/eval document pair
    * sharing ≥ `minShared` distinct token n-grams (df-capped universe).
    */
  def overlaps(spark: SparkSession, sfDir: String, n: Int = DefaultN,
      evalMod: Int = 10, evalRes: Int = 7, minShared: Int = 1): DataFrame =
    overlapsOf(Tables.documents(spark, sfDir), n, evalMod, evalRes, minShared)

  /** [[overlaps]] over any (doc_id, text) frame — reusable for planted-
    * fixture specs.
    */
  def overlapsOf(docs: DataFrame, n: Int = DefaultN,
      evalMod: Int = 10, evalRes: Int = 7, minShared: Int = 1): DataFrame =
    pairsFrom(ngramRows(docs, n), evalMod, evalRes, minShared)

  /** The posting-list core shared by [[overlapsOf]] and
    * [[overlapsBloomOf]]: both sides' lists from one grouped aggregation
    * over (doc_id, ngram) rows, df-capped pair expansion, ids only.
    */
  private def pairsFrom(ng: DataFrame, evalMod: Int, evalRes: Int,
      minShared: Int): DataFrame = {
    val spark = ng.sparkSession
    import spark.implicits._
    // BOTH sides' posting lists in one grouped aggregation (collect_list
    // skips the other side's nulls) — one corpus scan and one shuffle on
    // the n-gram, where building each side separately would scan documents
    // twice and join the posting tables. Pair expansion is ≤ df² per
    // n-gram by the per-side caps, and rows carry ids only
    val evalSide = col("doc_id") % evalMod === evalRes
    val pairs = ng.groupBy("ngram")
      .agg(
        sort_array(collect_list(when(!evalSide, col("doc_id")))).as("cids"),
        sort_array(collect_list(when(evalSide, col("doc_id")))).as("eids"))
      .where(size(col("cids")).between(1, MaxNgramDf) &&
        size(col("eids")).between(1, MaxNgramDf))
      .select(col("cids"), col("eids")).as[(Seq[Long], Seq[Long])]
      .flatMap { case (cids, eids) =>
        for (c <- cids.iterator; e <- eids.iterator) yield (c, e)
      }
      .toDF("corpus_id", "eval_id")
    pairs.groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .orderBy("corpus_id", "eval_id")
  }

  /** [[overlaps]] with a Bloom-filter runtime prefilter on the corpus
    * side — the 100 TB shape of decontamination. The eval side is tiny by
    * construction (a benchmark set), so its n-gram universe fits a Bloom
    * filter that is broadcast to every task; corpus n-grams that cannot
    * possibly match (the overwhelming majority at scale) are dropped
    * DURING the scan, before the posting shuffle — the exchange then
    * carries ~matching n-grams instead of the full corpus n-gram stream.
    *
    * Correctness is EXACT, not approximate: a Bloom filter has no false
    * negatives, so every true overlap survives the prefilter, and false
    * positives are eliminated by the downstream posting join (an n-gram
    * with no real eval-side rows fails the `size(eids) >= 1` gate). The
    * output — and therefore the oracle — is identical to [[overlaps]];
    * the spec pins frame equality between the two plans.
    */
  def overlapsBloom(spark: SparkSession, sfDir: String, n: Int = DefaultN,
      evalMod: Int = 10, evalRes: Int = 7, minShared: Int = 1,
      fpp: Double = 0.01): DataFrame =
    overlapsBloomOf(Tables.documents(spark, sfDir), n, evalMod, evalRes,
      minShared, fpp)

  /** [[overlapsBloom]] over any (doc_id, text) frame. */
  def overlapsBloomOf(docs: DataFrame, n: Int = DefaultN,
      evalMod: Int = 10, evalRes: Int = 7, minShared: Int = 1,
      fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val evalNg = ngramRows(docs.where(col("doc_id") % evalMod === evalRes), n)
    // expectedNumItems from a count of the (small) eval side — one cheap
    // job; sizing the filter from the corpus side would defeat the point
    val expected = math.max(1000L, evalNg.count())
    val bloom = evalNg.stat.bloomFilter("ngram", expected, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val ng = ngramRows(docs, n).as[(Long, String)]
      .filter(r => bloomBc.value.mightContainString(r._2))
      .toDF("doc_id", "ngram")
    pairsFrom(ng, evalMod, evalRes, minShared)
  }

  /** DuckDB oracle — identical n-gram definition, identical per-side df
    * caps, identical pair semantics.
    */
  def overlapsSql(n: Int = DefaultN, evalMod: Int = 10, evalRes: Int = 7,
      minShared: Int = 1): String = {
    val concat = (0 until n).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
       |ng AS (SELECT doc_id, unnest(CASE WHEN len(t) >= $n
       |         THEN list_distinct(list_transform(generate_series(1, len(t)-${n - 1}),
       |                i -> $concat))
       |         ELSE list_distinct([text]) END) AS ngram
       |       FROM toks),
       |cn AS (SELECT doc_id, ngram FROM ng WHERE doc_id % $evalMod <> $evalRes),
       |en AS (SELECT doc_id, ngram FROM ng WHERE doc_id % $evalMod = $evalRes),
       |ck AS (SELECT ngram FROM cn GROUP BY 1 HAVING count(*) <= $MaxNgramDf),
       |ek AS (SELECT ngram FROM en GROUP BY 1 HAVING count(*) <= $MaxNgramDf),
       |pairs AS (
       |  SELECT cn.doc_id AS corpus_id, en.doc_id AS eval_id
       |  FROM cn JOIN ck USING (ngram) JOIN en USING (ngram) JOIN ek USING (ngram))
       |SELECT corpus_id, eval_id, count(*) AS n_shared
       |FROM pairs GROUP BY 1, 2 HAVING count(*) >= $minShared
       |ORDER BY corpus_id, eval_id""".stripMargin
  }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram overlap check above: a paraphrased benchmark item shares no
    * 8-gram with its source but sits next to it in embedding space, so
    * production decontamination runs BOTH. A corpus vector is flagged
    * when its cosine against ANY eval-slice vector reaches `threshold`;
    * the report carries the hit count and the max similarity.
    *
    * Scale shape: the eval side is benchmark-sized — it BROADCASTS, and
    * the corpus side is scanned ONCE map-side with no shuffle of
    * embeddings at all (the broadcast nested-loop join is the right plan
    * precisely because one side is tiny and the condition is a
    * similarity, not an equality); only flagged (id, count, max) rows
    * reach the aggregate. Threshold membership is engine-bit-stable: the
    * codegen'd `graft_cosine` and DuckDB's `list_cosine_similarity` both
    * accumulate sequentially in doubles, the same argument every
    * threshold/ranking entry in the similarity family already leans on.
    * At 100 TB, composition with the IVF cell layout (probe only cells
    * whose centroid clears a looser bound) cuts the per-row eval loop;
    * the brute-force form here is exact and is the oracle either way.
    */
  def semantic(spark: SparkSession, sfDir: String, threshold: Double = 0.35,
      evalMod: Int = 20, evalRes: Int = 7): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val eval = e.filter(col("vec_id") % evalMod === evalRes)
      .select(col("vec_id").as("eval_id"), col("v").as("ev"))
    val corpus = e.filter(col("vec_id") % evalMod =!= evalRes)
    corpus.join(broadcast(eval),
        Similarity.cosine(col("v"), col("ev")) >= threshold)
      .groupBy("vec_id")
      .agg(count(lit(1)).cast("long").as("n_hits"),
        round(max(Similarity.cosine(col("v"), col("ev"))), 4).as("max_cos"))
      .orderBy("vec_id")
  }

  def semanticSql(threshold: Double = 0.35, evalMod: Int = 20,
      evalRes: Int = 7): String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ev AS (SELECT vec_id AS eval_id, v AS evv FROM e
       |       WHERE vec_id % $evalMod = $evalRes),
       |c AS (SELECT * FROM e WHERE vec_id % $evalMod <> $evalRes)
       |SELECT c.vec_id, CAST(count(*) AS BIGINT) AS n_hits,
       |       round(max(list_cosine_similarity(c.v, ev.evv)), 4) AS max_cos
       |FROM c JOIN ev ON list_cosine_similarity(c.v, ev.evv) >= $threshold
       |GROUP BY c.vec_id ORDER BY c.vec_id""".stripMargin
}

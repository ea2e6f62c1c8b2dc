package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-level frequent-n-gram mining and boilerplate flagging — the
  * diagnostic pass behind boilerplate removal (headers, footers, license
  * blocks repeat verbatim across a crawl; they surface as globally
  * over-frequent word n-grams long before any pairwise dedup sees them).
  *
  * Two operators:
  *   - [[topNgrams]]: the corpus-wide top-k 5-grams by occurrence count.
  *     One shingle flatMap (shuffle keyed by shingle, map-side combined)
  *     and a global top-k, which Spark executes as TakeOrderedAndProject —
  *     per-partition heaps of k rows, never a full sort.
  *   - [[boilerplateDocs]]: flag documents containing any of the top-`top`
  *     mined shingles. The mined set is bounded by construction (k rows),
  *     so the second pass is a broadcast semi-join against the shingle
  *     stream — the corpus is scanned, nothing corpus-sized shuffles except
  *     the per-doc aggregate.
  *
  * At 100 TB the mined counts table is the thing to persist (it is tiny);
  * both passes stay single-scan. Ties in the top-k break lexicographically
  * so the cut is deterministic in both engines.
  */
object Ngrams {

  private val N = 5

  /** The exploded (doc_id, shingle) stream as a typed flatMap — one tight
    * JVM pass with a shared StringBuilder, instead of the Column HOF form
    * (`transform` + `slice` re-evaluates the token array per element).
    * Same output as `unnest(list_transform(...))` in the oracle.
    */
  private def shingleStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        if (t.length < N) Iterator.empty
        else Iterator.tabulate(t.length - N + 1) { i =>
          val sb = new StringBuilder(t(i))
          var j = 1
          while (j < N) { sb.append(' ').append(t(i + j)); j += 1 }
          (id, sb.toString)
        }
      }
      .toDF("doc_id", "shingle")
  }

  def topNgrams(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = shingleStream(spark, sfDir)
      .groupBy("shingle")
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"))
    // global top-k: a single-partition window over k candidates would be
    // fine too, but orderBy+limit lets Spark pick TakeOrderedAndProject
    counted.orderBy(col("n_occurrences").desc, col("shingle")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n_occurrences").desc, col("shingle"))))
      .select(col("rank"), col("shingle"), col("n_occurrences"), col("n_docs"))
      .orderBy("rank")
  }

  def topNgramsSql(k: Int = 20): String =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(string_split(text, ' ')) - ${N - 1}, 0)),
       |    i -> array_to_string(string_split(text, ' ')[i:i+${N - 1}], ' '))) AS shingle
       |  FROM documents),
       |counted AS (
       |  SELECT shingle, count(*) AS n_occurrences,
       |    count(DISTINCT doc_id) AS n_docs
       |  FROM sh GROUP BY 1),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, shingle) AS rank
       |  FROM counted)
       |SELECT rank, shingle, n_occurrences, n_docs
       |FROM ranked WHERE rank <= $k ORDER BY rank""".stripMargin

  /** Documents containing any of the corpus's `top` most frequent 5-grams:
    * (doc_id, distinct boilerplate shingles present, total hits, flag
    * threshold ≥ `minHits` hits). The mined top set is k rows — broadcast;
    * the join keys the exploded shingle stream against it.
    */
  def boilerplateDocs(spark: SparkSession, sfDir: String,
      top: Int = 10, minHits: Int = 2): DataFrame = {
    val mined = topNgrams(spark, sfDir, top).select(col("shingle"))
    val sh = shingleStream(spark, sfDir)
    sh.join(broadcast(mined), "shingle")
      .groupBy("doc_id")
      .agg(count_distinct(col("shingle")).as("n_boiler_shingles"),
        count(lit(1)).as("n_boiler_hits"))
      .withColumn("is_boilerplate", col("n_boiler_hits") >= minHits)
      .orderBy("doc_id")
      .select("doc_id", "n_boiler_shingles", "n_boiler_hits", "is_boilerplate")
  }

  def boilerplateDocsSql(top: Int = 10, minHits: Int = 2): String =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(string_split(text, ' ')) - ${N - 1}, 0)),
       |    i -> array_to_string(string_split(text, ' ')[i:i+${N - 1}], ' '))) AS shingle
       |  FROM documents),
       |counted AS (
       |  SELECT shingle, count(*) AS n_occurrences
       |  FROM sh GROUP BY 1),
       |mined AS (
       |  SELECT shingle FROM (
       |    SELECT shingle, row_number() OVER (ORDER BY n_occurrences DESC, shingle) AS rank
       |    FROM counted) WHERE rank <= $top)
       |SELECT doc_id,
       |  count(DISTINCT shingle) AS n_boiler_shingles,
       |  count(*) AS n_boiler_hits,
       |  count(*) >= $minHits AS is_boilerplate
       |FROM sh JOIN mined USING (shingle)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashes
import graft.sources.Tables

/** Exact-substring span dedup — the token-span family of Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better"
  * (arXiv:2107.06499): find every maximal token span that occurs verbatim
  * in ≥2 documents, so a curation stage can cut the span (not the whole
  * document — the defining difference from the document-level dedup
  * families in [[Dedup]], which keep or drop documents whole).
  *
  * The paper builds a corpus-wide suffix array — an inherently sequential,
  * single-machine index. The Spark reshape is the standard fixed-length
  * window form: every L-token window is keyed by an arithmetic hash of its
  * text, windows whose hash occurs in ≥2 documents are "duplicated", and a
  * doc's duplicated windows merge into maximal spans. Any duplicated span
  * of ≥ L tokens contains a duplicated L-window at every offset, so span
  * recall is exact down to the L floor (spans shorter than L are invisible
  * — L IS the paper's minimum-match-length knob, their 50 BPE tokens; 8
  * here so the small fixture exercises it).
  *
  * Hash, not string, on BOTH sides: the shuffle key is the 8-byte
  * [[Hashes.polyHashJvm]] of the window — the corpus-sized exchanges carry
  * (hash, doc_id, pos) rows, never window text. A hash collision merges two
  * distinct windows into one dup group; the oracle hashes with the same
  * arithmetic ([[Hashes.polyHashSql]]), so both engines see identical
  * collisions and the gate stays bit-exact. (The paper accepts the same
  * trade — dup candidates by hash equality.)
  *
  * Scale shape at 100 TB:
  *   - window rows are a pure function of each doc's own text — ONE typed
  *     flatMap, no shuffle, O(tokens) rows of 24 bytes.
  *   - the dup-hash set needs a (hash → distinct docs, total df) count:
  *     one shuffle of the hashed rows with map-side partial aggregation.
  *     [[MaxWindowDf]] caps boilerplate windows (licence headers, templated
  *     text) exactly like [[Dedup.MaxShingleDf]] caps shingles — a window
  *     in thousands of docs is boilerplate to a boilerplate FILTER
  *     ([[Ngrams]]), not a span to cut per-doc.
  *   - positions re-join the dup set on the hash (second corpus pass — the
  *     count-then-filter two-pass shape of [[Search.bm25TopK]]'s df leg;
  *     at 100 TB two cheap column-pruned scans beat persisting an
  *     O(tokens) intermediate).
  *   - span merge is one window over (doc_id, pos): per-doc state only,
  *     millions of tiny partitions — the partitioning a shuffle on doc_id
  *     gives for free. No global ordering anywhere.
  *
  * Merge rule (engines must agree): duplicated windows at positions p, p'
  * (p < p') join the same span iff p' − p ≤ L — overlapping (< L) or
  * exactly abutting (= L) windows chain; a gap > L splits. A span's token
  * extent is [start, last_window_pos + L).
  */
object SubstringDedup {

  /** Minimum duplicated-span length in tokens (the window length). */
  val SpanTokens = 8

  /** Windows occurring more often than this corpus-wide are dropped from
    * the dup universe (both engines) — the boilerplate guard.
    */
  val MaxWindowDf = 50

  /** (doc_id, span_id, start_tok, end_tok, n_tokens, n_windows) — one row
    * per maximal duplicated span, positions in token units, end exclusive.
    */
  def substringSpans(spark: SparkSession, sfDir: String,
      l: Int = SpanTokens, maxDf: Int = MaxWindowDf): DataFrame =
    substringSpansOf(Tables.documents(spark, sfDir), l, maxDf)

  /** [[substringSpans]] over any (doc_id, text) frame. */
  def substringSpansOf(docs: DataFrame, l: Int = SpanTokens,
      maxDf: Int = MaxWindowDf): DataFrame = {
    require(l > 0 && maxDf >= 2, s"need l > 0 and maxDf >= 2, got l=$l maxDf=$maxDf")
    val spark = docs.sparkSession
    import spark.implicits._
    def winRows: DataFrame = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        // one rolling StringBuilder join per window; the hash is of the
        // window's exact text (tokens re-joined with single spaces), so
        // equal-hash ⇒ equal-window up to hash collisions — mirrored in SQL
        Iterator.range(0, t.length - l + 1).map { pos =>
          val sb = new StringBuilder
          var i = pos
          while (i < pos + l) {
            if (i > pos) sb.append(' ')
            sb.append(t(i))
            i += 1
          }
          (id, pos, Hashes.polyHashJvm(sb.toString))
        }
      }
      .toDF("doc_id", "pos", "h")
    // dup universe: hash in ≥2 distinct docs, total occurrences ≤ maxDf.
    // count_distinct + count plan via Expand — both partial-aggregable,
    // the shuffle carries (h, doc_id) pairs
    val dupHashes = winRows.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("nd"), count(lit(1)).as("df"))
      .where(col("nd") >= 2 && col("df") <= maxDf)
      .select("h")
    val dupPos = winRows.join(dupHashes, "h").select("doc_id", "pos")
    // gaps-and-islands span merge, per doc
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = dupPos
      .withColumn("new_span",
        when(col("pos") - lag(col("pos"), 1).over(byPos) <= l, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("span_id", sum(col("new_span")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    spans.groupBy("doc_id", "span_id")
      .agg(
        min(col("pos")).as("start_tok"),
        (max(col("pos")) + l).as("end_tok"),
        (max(col("pos")) + l - min(col("pos"))).as("n_tokens"),
        count(lit(1)).as("n_windows"))
      .orderBy("doc_id", "span_id")
  }

  /** DuckDB oracle — identical windows (list slicing, single-space
    * re-join), identical arithmetic hash, identical merge rule.
    */
  def substringSpansSql(l: Int = SpanTokens, maxDf: Int = MaxWindowDf): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |w AS (SELECT doc_id, unnest(generate_series(0, len(t) - $l)) AS pos, t
       |      FROM toks),
       |wh AS (SELECT doc_id, pos,
       |    ${Hashes.polyHashSql(s"array_to_string(t[pos + 1 : pos + $l], ' ')")} AS h
       |  FROM w),
       |dup AS (SELECT h FROM wh GROUP BY 1
       |        HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= $maxDf),
       |dpos AS (SELECT doc_id, pos FROM wh JOIN dup USING (h)),
       |flag AS (SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $l
       |         THEN 0 ELSE 1 END AS new_span
       |  FROM dpos),
       |isl AS (SELECT doc_id, pos,
       |    CAST(sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span_id
       |  FROM flag)
       |SELECT doc_id, span_id, min(pos) AS start_tok, max(pos) + $l AS end_tok,
       |  max(pos) + $l - min(pos) AS n_tokens, count(*) AS n_windows
       |FROM isl GROUP BY 1, 2 ORDER BY doc_id, span_id""".stripMargin
}

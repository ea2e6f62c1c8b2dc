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
  * exactly abutting (= L) windows chain; a gap > L splits. Because a gap
  * ≤ L leaves no uncovered hole, a merged span's token extent
  * [start, last_window_pos + L) is the EXACT union of its windows'
  * ranges — the property the scrub's coverage arithmetic relies on.
  */
object SubstringDedup {

  /** Minimum duplicated-span length in tokens (the window length). */
  val SpanTokens = 8

  /** Windows occurring more often than this corpus-wide are dropped from
    * the dup universe (both engines) — the boilerplate guard.
    */
  val MaxWindowDf = 50

  // ------------------------------------------------------ shared kernels

  /** (doc_id, pos, h) — every L-token window of every document, keyed by
    * the arithmetic hash of its text (tokens re-joined with single
    * spaces). One typed flatMap, no shuffle. THE window definition every
    * operator in this family shares, so the spans report, the scrub, and
    * the profile cannot drift apart.
    *
    * Hashing is ROLLING: [[Hashes.polyHashJvm]] is a polynomial mod a
    * prime, so sliding the window one token is an exact residue update —
    * append the new token's chars (shift by B^chars, add its hash), then
    * subtract the departing token's prefix contribution (its hash times
    * B^remaining-chars). Modular arithmetic is exact, so every window's
    * value is BIT-IDENTICAL to hashing its joined text from scratch (the
    * regression spec pins this), and total work drops from O(L·tokens)
    * string-builds to O(chars) — at the paper's L=50 that is the ~50×
    * CPU the round-4 verdict flagged on the hottest span-dedup pass.
    * NULL text contributes no windows (filtered before the typed map —
    * `split` on a null would NPE; the oracle's string_split(NULL) CTE
    * likewise yields no window rows).
    */
  private def windowRows(docs: DataFrame, l: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .where(col("text").isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        rollingWindowHashes(text, l).iterator.zipWithIndex
          .map { case (h, pos) => (id, pos, h) }
      }
      .toDF("doc_id", "pos", "h")
  }

  /** The [[Hashes.polyHashJvm]] of every L-token window of `text` (tokens
    * re-joined with single spaces), computed by rolling update — one pass
    * over the characters, bit-identical to hashing each window's string.
    */
  private[pipeline] def rollingWindowHashes(text: String, l: Int): Array[Long] = {
    import Hashes.{Base, Prime}
    val t = text.split(" ", -1)
    val n = t.length - l + 1
    if (n <= 0) return Array.empty[Long]
    // per-token hashes, computed once — O(chars) total
    val tokHash = new Array[Long](t.length)
    var j = 0
    while (j < t.length) { tokHash(j) = Hashes.polyHashJvm(t(j)); j += 1 }
    // B^e mod Prime, memoized up to the longest exponent used (window
    // char length) — grows on demand, O(1) amortized per lookup
    val pows = new scala.collection.mutable.ArrayBuffer[Long](64)
    pows += 1L
    def powB(e: Int): Long = {
      while (pows.length <= e) pows += pows(pows.length - 1) * Base % Prime
      pows(e)
    }
    val out = new Array[Long](n)
    // initial window [0, l): fold the tokens in, space-separated
    var h = 0L
    var curLen = 0 // char length of the current window's joined string
    var i = 0
    while (i < l) {
      if (i > 0) { h = (h * Base + ' ') % Prime; curLen += 1 }
      h = (h * powB(t(i).length) + tokHash(i)) % Prime
      curLen += t(i).length
      i += 1
    }
    out(0) = h
    var pos = 1
    while (pos < n) {
      // append ' ' + t(pos + l - 1)
      val add = pos + l - 1
      h = (h * Base + ' ') % Prime
      h = (h * powB(t(add).length) + tokHash(add)) % Prime
      curLen += 1 + t(add).length
      // remove the leading t(pos - 1) + ' ': for S = prefix ++ rest,
      // hash(S) = hash(prefix)·B^|rest| + hash(rest) (mod Prime)
      val remLen = curLen - (t(pos - 1).length + 1)
      val prefixHash = (tokHash(pos - 1) * Base + ' ') % Prime
      h = ((h - prefixHash * powB(remLen)) % Prime + Prime) % Prime
      curLen = remLen
      out(pos) = h
      pos += 1
    }
    out
  }

  /** Gaps-and-islands merge of (keys…, pos) window rows into maximal
    * spans: (keys…, span_id, start_tok, end_tok, n_windows). One window
    * partitioned by `keys` — per-partition state only (per-doc for the
    * default keys).
    */
  private def mergeSpans(posRows: DataFrame, l: Int,
      keys: Seq[String] = Seq("doc_id")): DataFrame = {
    val byPos = Window.partitionBy(keys.map(col): _*).orderBy(col("pos"))
    posRows
      .withColumn("new_span",
        when(col("pos") - lag(col("pos"), 1).over(byPos) <= l, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("span_id", sum(col("new_span")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keys.head, keys.tail :+ "span_id": _*)
      .agg(
        min(col("pos")).as("start_tok"),
        (max(col("pos")) + l).as("end_tok"),
        count(lit(1)).as("n_windows"))
  }

  /** The toks/w/wh SQL CTE prefix shared by every oracle in this family —
    * identical windows (list slicing, single-space re-join), identical
    * arithmetic hash. `tokCols` lets the profile carry `lang` through.
    */
  private def windowCtes(l: Int, tokCols: String = "doc_id"): String =
    s"""toks AS (SELECT $tokCols, string_split(text, ' ') AS t FROM documents),
       |w AS (SELECT doc_id, unnest(generate_series(0, len(t) - $l)) AS pos, t
       |      FROM toks),
       |wh AS (SELECT doc_id, pos,
       |    ${Hashes.polyHashSql(s"array_to_string(t[pos + 1 : pos + $l], ' ')")} AS h
       |  FROM w)""".stripMargin

  /** The islands-merge SQL CTE chain over a (keys…, pos) source —
    * identical merge rule; emits `${prefix}spans`.
    */
  private def islandCtes(src: String, prefix: String, l: Int,
      keys: String = "doc_id"): String =
    s"""${prefix}flag AS (SELECT $keys, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY $keys ORDER BY pos) <= $l
       |         THEN 0 ELSE 1 END AS new_span
       |  FROM $src),
       |${prefix}isl AS (SELECT $keys, pos,
       |    CAST(sum(new_span) OVER (PARTITION BY $keys ORDER BY pos
       |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span_id
       |  FROM ${prefix}flag),
       |${prefix}spans AS (SELECT $keys, span_id, min(pos) AS start_tok,
       |    max(pos) + $l AS end_tok, count(*) AS n_windows
       |  FROM ${prefix}isl GROUP BY $keys, span_id)""".stripMargin

  // ------------------------------------------------------- spans report

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
    def winRows = windowRows(docs, l)
    // dup universe: hash in ≥2 distinct docs, total occurrences ≤ maxDf.
    // count_distinct + count plan via Expand — both partial-aggregable,
    // the shuffle carries (h, doc_id) pairs
    val dupHashes = winRows.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("nd"), count(lit(1)).as("df"))
      .where(col("nd") >= 2 && col("df") <= maxDf)
      .select("h")
    val dupPos = winRows.join(dupHashes, "h").select("doc_id", "pos")
    mergeSpans(dupPos, l)
      .select(col("doc_id"), col("span_id"), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok")).as("n_tokens"), col("n_windows"))
      .orderBy("doc_id", "span_id")
  }

  /** DuckDB oracle — shared window/hash/merge CTEs. */
  def substringSpansSql(l: Int = SpanTokens, maxDf: Int = MaxWindowDf): String =
    s"""WITH ${windowCtes(l)},
       |dup AS (SELECT h FROM wh GROUP BY 1
       |        HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= $maxDf),
       |dpos AS (SELECT doc_id, pos FROM wh JOIN dup USING (h)),
       |${islandCtes("dpos", "", l)}
       |SELECT doc_id, span_id, start_tok, end_tok,
       |  end_tok - start_tok AS n_tokens, n_windows
       |FROM spans ORDER BY doc_id, span_id""".stripMargin

  // ----------------------------------------------------------- profile

  /** Corpus-profiling view of the span family: per language, how much of
    * the corpus is duplicated-span text (canonical occurrences INCLUDED —
    * this measures duplication exposure, where [[substringScrub]] measures
    * what a cut would remove). The number a curation pipeline watches to
    * decide whether span-level dedup is worth a rewrite pass, and the
    * cross-doc complement of [[Repetition]]'s within-doc fractions.
    *
    * Scale shape: [[substringSpans]]'s machinery plus one per-doc token
    * aggregate, a doc_id-keyed join back to the documents scan, and a
    * languages-sized final aggregate. Integer token counts sum order-free;
    * the single division happens once per language row at the end.
    */
  def dupSpanProfile(spark: SparkSession, sfDir: String,
      l: Int = SpanTokens, maxDf: Int = MaxWindowDf): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val perDoc = substringSpansOf(docs, l, maxDf)
      .groupBy("doc_id")
      .agg(sum(col("n_tokens")).as("dup_tokens"))
    docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ", -1)).as("total"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("dup_tokens")).as("docs_with_dups"),
        sum(coalesce(col("dup_tokens"), lit(0L))).as("dup_tokens"),
        sum(col("total")).as("total_tokens"))
      .withColumn("dup_share",
        round(col("dup_tokens").cast("double") / col("total_tokens"), 4))
      .orderBy("lang")
  }

  /** DuckDB oracle for [[dupSpanProfile]] — the [[substringSpansSql]]
    * chain, then dup tokens per doc, language join, one division per row.
    */
  def dupSpanProfileSql(l: Int = SpanTokens, maxDf: Int = MaxWindowDf): String =
    s"""WITH ${windowCtes(l, tokCols = "doc_id, lang")},
       |dup AS (SELECT h FROM wh GROUP BY 1
       |        HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= $maxDf),
       |dpos AS (SELECT doc_id, pos FROM wh JOIN dup USING (h)),
       |${islandCtes("dpos", "", l)},
       |per_doc AS (SELECT doc_id,
       |    CAST(sum(end_tok - start_tok) AS BIGINT) AS dup_tokens
       |  FROM spans GROUP BY 1)
       |SELECT lang,
       |  count(*) AS n_docs,
       |  count(per_doc.dup_tokens) AS docs_with_dups,
       |  CAST(sum(coalesce(per_doc.dup_tokens, 0)) AS BIGINT) AS dup_tokens,
       |  CAST(sum(len(toks.t)) AS BIGINT) AS total_tokens,
       |  round(CAST(sum(coalesce(per_doc.dup_tokens, 0)) AS DOUBLE)
       |    / sum(len(toks.t)), 4) AS dup_share
       |FROM toks LEFT JOIN per_doc USING (doc_id)
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------------- scrub

  /** Scrub — the apply layer ([[substringSpans]] is the report): cut
    * duplicated text, keep one copy, emit the cleaned corpus. Every
    * document appears in the output (untouched docs pass through with zero
    * cut) — this is the corpus-rewrite a curation pipeline materializes.
    *
    * Cut rule: canonicality is per duplicated window — the MINIMUM doc_id
    * holding the window is its keeper. A token is cut iff it is covered by
    * some NON-canonical duplicated window AND by NO window canonical to
    * this doc. The protect clause is what makes "keep one copy" a real
    * guarantee: every duplicated window's text survives verbatim in its
    * canonical document, even when an OVERLAPPING window has a different
    * (lower-id) canonical doc — without it, that overlap's cut would
    * remove part of the protected window from its own keeper and the
    * content could vanish from the whole corpus.
    *
    * Scale additions over [[substringSpans]]: the dup aggregate also
    * carries min(doc_id) (free in the same shuffle); cut and protect
    * coverage merge together in ONE (doc, class)-partitioned window
    * (merged spans are EXACT window-range unions — the merge-rule
    * property), one conditional-collect aggregate builds both range lists,
    * they join back to the documents scan by doc_id, and a typed map
    * rebuilds each doc's text outside (cut − protect) — per-doc state
    * only. Output is corpus-sized by design (it IS the cleaned corpus),
    * written straight through, no extra exchange.
    */
  def substringScrub(spark: SparkSession, sfDir: String,
      l: Int = SpanTokens, maxDf: Int = MaxWindowDf): DataFrame =
    substringScrubOf(Tables.documents(spark, sfDir), l, maxDf)

  /** [[substringScrub]] over any (doc_id, text) frame. */
  def substringScrubOf(docs: DataFrame, l: Int = SpanTokens,
      maxDf: Int = MaxWindowDf): DataFrame = {
    require(l > 0 && maxDf >= 2, s"need l > 0 and maxDf >= 2, got l=$l maxDf=$maxDf")
    val spark = docs.sparkSession
    import spark.implicits._
    def winRows = windowRows(docs, l)
    val dupKeep = winRows.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("nd"), count(lit(1)).as("df"),
        min(col("doc_id")).as("keep_id"))
      .where(col("nd") >= 2 && col("df") <= maxDf)
      .select("h", "keep_id")
    // cut and protect coverage merged in ONE pass: the islands window
    // partitions by (doc, class), so the two classes never mix and the
    // whole computation stays a single lineage (the plan's THREE documents
    // scans — dup aggregate, position pass, rebuild join; a second
    // mergeSpans branch would re-execute winRows+dupKeep and make it five)
    val marked = winRows.join(dupKeep, "h")
      .select(col("doc_id"), col("pos"),
        (col("doc_id") =!= col("keep_id")).as("is_cut"))
    val spans = mergeSpans(marked, l, keys = Seq("doc_id", "is_cut"))
    // conditional collect: when() without otherwise yields NULL, which
    // collect_list drops — one aggregation produces all four arrays
    val cuts = spans.groupBy("doc_id").agg(
      sort_array(collect_list(when(col("is_cut"), col("start_tok")))).as("c_starts"),
      sort_array(collect_list(when(col("is_cut"), col("end_tok")))).as("c_ends"),
      sort_array(collect_list(when(!col("is_cut"), col("start_tok")))).as("p_starts"),
      sort_array(collect_list(when(!col("is_cut"), col("end_tok")))).as("p_ends"))
    val emptyInts = array().cast("array<int>")
    // NULL text ⇒ empty string before the typed rebuild map (split on a
    // null would NPE); such a doc has no windows, hence no cut/protect
    // rows, and passes through as (doc_id, 0, "")
    docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("c_starts"), emptyInts).as("cs"),
        coalesce(col("c_ends"), emptyInts).as("ce"),
        coalesce(col("p_starts"), emptyInts).as("ps"),
        coalesce(col("p_ends"), emptyInts).as("pe"))
      .as[(Long, String, Seq[Int], Seq[Int], Seq[Int], Seq[Int])]
      .map { case (id, text, cs, ce, ps, pe) =>
        val t = text.split(" ", -1)
        val kept = new StringBuilder
        var nCut = 0L
        var ci = 0; var pi = 0
        var i = 0
        while (i < t.length) {
          while (ci < cs.length && i >= ce(ci)) ci += 1
          while (pi < ps.length && i >= pe(pi)) pi += 1
          val inCut = ci < cs.length && i >= cs(ci) && i < ce(ci)
          val inProtect = pi < ps.length && i >= ps(pi) && i < pe(pi)
          if (inCut && !inProtect) nCut += 1
          else {
            if (kept.nonEmpty) kept.append(' ')
            kept.append(t(i))
          }
          i += 1
        }
        (id, nCut, kept.toString)
      }
      .toDF("doc_id", "n_tokens_cut", "clean_text")
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[substringScrub]] — identical dup universe,
    * canonical rule, and cut-minus-protect coverage (EXISTS cut span AND
    * NOT EXISTS protect span).
    */
  def substringScrubSql(l: Int = SpanTokens, maxDf: Int = MaxWindowDf): String =
    s"""WITH ${windowCtes(l)},
       |dup AS (SELECT h, min(doc_id) AS keep_id FROM wh GROUP BY 1
       |        HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= $maxDf),
       |marked AS (SELECT doc_id, pos, doc_id <> keep_id AS is_cut
       |           FROM wh JOIN dup USING (h)),
       |${islandCtes("marked", "", l, keys = "doc_id, is_cut")},
       |p AS (SELECT doc_id, unnest(generate_series(0, len(t) - 1)) AS i, t
       |      FROM toks),
       |kept AS (
       |  SELECT p.doc_id, p.i, p.t[p.i + 1] AS tok FROM p
       |  WHERE NOT EXISTS (SELECT 1 FROM spans s
       |    WHERE s.doc_id = p.doc_id AND s.is_cut
       |      AND p.i >= s.start_tok AND p.i < s.end_tok)
       |    OR EXISTS (SELECT 1 FROM spans s
       |    WHERE s.doc_id = p.doc_id AND NOT s.is_cut
       |      AND p.i >= s.start_tok AND p.i < s.end_tok))
       |SELECT toks.doc_id,
       |  len(toks.t) - count(kept.i) AS n_tokens_cut,
       |  coalesce(array_to_string(list(kept.tok ORDER BY kept.i), ' '), '') AS clean_text
       |FROM toks LEFT JOIN kept ON toks.doc_id = kept.doc_id
       |GROUP BY toks.doc_id, toks.t ORDER BY toks.doc_id""".stripMargin
}

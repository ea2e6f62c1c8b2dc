package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Gopher-style repetition filters — the published pre-training quality
  * signals that catch boilerplate/spam documents exact dedup misses:
  * duplicate-line fraction, duplicate-line character fraction, top-2/3-gram
  * character fraction, duplicated-5-gram character fraction, and the
  * combined keep/drop flag at the published thresholds.
  *
  * Definitions (one copy — the typed map and the oracle CTEs must agree):
  * lines = split on newline keeping empties; tokens = split on single
  * space keeping empties; n-grams = overlapping token n-grams joined with
  * a single space, NON-distinct (occurrence counts are the signal);
  * `dup_line_frac` = (lines − distinct lines)/lines; char fractions are
  * over `length(text)`; the top n-gram tiebreak is lexicographic (binary
  * collation — both corpora are ASCII). `dup5gram_char_frac` uses the
  * standard Σ count·len approximation over duplicated grams (overlapping
  * occurrences double-count, so it can exceed 1 — documented Gopher-impl
  * behavior, thresholded the same way).
  *
  * Scale design: per-document integer numerators are computed in ONE typed
  * map pass (a document's repetition profile is a pure function of its own
  * text — no shuffle, nothing but (doc_id, 7 longs) leaves the mapper);
  * fractions, rounding, and the flag are Column arithmetic on those
  * integers, so both engines divide the same integers and the hash gate
  * stays exact.
  */
object Repetition {

  /** Gopher keep-thresholds: a doc is repetitive if ANY signal exceeds
    * its bound (dup lines 0.30, dup line chars 0.20, top 2-gram 0.20,
    * top 3-gram 0.18, dup 5-grams 0.15).
    */
  val MaxDupLineFrac = 0.30
  val MaxDupLineCharFrac = 0.20
  val MaxTop2GramCharFrac = 0.20
  val MaxTop3GramCharFrac = 0.18
  val MaxDup5GramCharFrac = 0.15

  /** (n-gram → occurrence count) over overlapping token n-grams; empty
    * when the doc has fewer than n tokens.
    */
  private def gramCounts(t: Array[String], n: Int): collection.mutable.HashMap[String, Int] = {
    val m = collection.mutable.HashMap.empty[String, Int]
    var i = 0
    while (i + n <= t.length) {
      val g = t.slice(i, i + n).mkString(" ")
      m.update(g, m.getOrElse(g, 0) + 1)
      i += 1
    }
    m
  }

  /** count·length of the most frequent n-gram (lexicographically smallest
    * among ties), 0 if none.
    */
  private def topGramChars(t: Array[String], n: Int): Long = {
    val m = gramCounts(t, n)
    if (m.isEmpty) 0L
    else {
      var bestG: String = null; var bestC = 0
      m.foreach { case (g, c) =>
        if (c > bestC || (c == bestC && g < bestG)) { bestG = g; bestC = c }
      }
      bestC.toLong * bestG.length
    }
  }

  /** Σ count·length over n-grams occurring more than once. */
  private def dupGramChars(t: Array[String], n: Int): Long = {
    var acc = 0L
    gramCounts(t, n).foreach { case (g, c) => if (c > 1) acc += c.toLong * g.length }
    acc
  }

  /** The integer numerators of every signal for one text: (text_chars,
    * n_lines, dup_lines, dup_line_chars, top2_chars, top3_chars,
    * dup5_chars) — shared by the profile map pass and the inline JVM flag.
    */
  private def numerators(text: String): (Long, Long, Long, Long, Long, Long, Long) = {
    val lines = text.split("\n", -1)
    val lineCounts = collection.mutable.HashMap.empty[String, Int]
    lines.foreach(l => lineCounts.update(l, lineCounts.getOrElse(l, 0) + 1))
    var dupLines = 0L; var dupLineChars = 0L
    lineCounts.foreach { case (l, c) =>
      if (c > 1) { dupLines += c - 1; dupLineChars += (c - 1).toLong * l.length }
    }
    val t = text.split(" ", -1)
    (text.length.toLong, lines.length.toLong, dupLines, dupLineChars,
      topGramChars(t, 2), topGramChars(t, 3), dupGramChars(t, 5))
  }

  /** The combined Gopher flag for one text, in the JVM — same integer
    * numerators and the same double divisions as the Column form in
    * [[repetitionOf]], so both paths agree bit-for-bit. Used where the
    * flag must compose into a single-scan map stage
    * ([[Curation.curateFull]]) instead of joining the profile frame.
    */
  def isRepetitiveJvm(text: String): Boolean = {
    val (tc, nLines, dupLines, dupLineChars, top2, top3, dup5) = numerators(text)
    def frac(num: Long, den: Long): Double = if (den == 0) 0.0 else num.toDouble / den
    frac(dupLines, nLines) > MaxDupLineFrac ||
      frac(dupLineChars, tc) > MaxDupLineCharFrac ||
      frac(top2, tc) > MaxTop2GramCharFrac ||
      frac(top3, tc) > MaxTop3GramCharFrac ||
      frac(dup5, tc) > MaxDup5GramCharFrac
  }

  /** Per-document repetition profile with the combined Gopher flag. */
  def repetition(spark: SparkSession, sfDir: String): DataFrame =
    repetitionOf(Tables.documents(spark, sfDir))

  /** [[repetition]] over any (doc_id, text) frame. */
  def repetitionOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val (tc, nLines, dupLines, dupLineChars, top2, top3, dup5) = numerators(text)
        (id, tc, nLines, dupLines, dupLineChars, top2, top3, dup5)
      }
      .toDF("doc_id", "text_chars", "n_lines", "dup_lines", "dup_line_chars",
        "top2_chars", "top3_chars", "dup5_chars")
    def frac(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === 0, 0.0).otherwise(num.cast("double") / den)
    val dlf = frac(col("dup_lines"), col("n_lines"))
    val dlcf = frac(col("dup_line_chars"), col("text_chars"))
    val t2 = frac(col("top2_chars"), col("text_chars"))
    val t3 = frac(col("top3_chars"), col("text_chars"))
    val d5 = frac(col("dup5_chars"), col("text_chars"))
    counts.select(
      col("doc_id"),
      round(dlf, 4).as("dup_line_frac"),
      round(dlcf, 4).as("dup_line_char_frac"),
      round(t2, 4).as("top2gram_char_frac"),
      round(t3, 4).as("top3gram_char_frac"),
      round(d5, 4).as("dup5gram_char_frac"),
      (dlf > MaxDupLineFrac || dlcf > MaxDupLineCharFrac ||
        t2 > MaxTop2GramCharFrac || t3 > MaxTop3GramCharFrac ||
        d5 > MaxDup5GramCharFrac).as("is_repetitive"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle — identical line/n-gram definitions, identical integer
    * numerators, identical divisions and thresholds.
    */
  val repetitionSql: String = {
    def gramCte(n: Int, name: String): String = {
      val concat = (0 until n).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""$name AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-${n - 1}),
         |    i -> $concat)) AS g
         |  FROM d WHERE len(t) >= $n)""".stripMargin
    }
    s"""WITH d AS (SELECT doc_id, length(text) AS tc,
       |    string_split(text, chr(10)) AS lines, string_split(text, ' ') AS t
       |  FROM documents),
       |ln AS (SELECT doc_id, unnest(lines) AS line FROM d),
       |lc AS (SELECT doc_id, line, count(*) AS c FROM ln GROUP BY 1, 2),
       |lagg AS (SELECT doc_id, sum(c) AS n_lines,
       |    sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS dup_lines,
       |    sum(CASE WHEN c > 1 THEN (c - 1) * length(line) ELSE 0 END) AS dup_line_chars
       |  FROM lc GROUP BY 1),
       |${gramCte(2, "g2")},
       |g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
       |g2top AS (SELECT doc_id, c * length(g) AS top2_chars,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rk
       |  FROM g2c),
       |${gramCte(3, "g3")},
       |g3c AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
       |g3top AS (SELECT doc_id, c * length(g) AS top3_chars,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rk
       |  FROM g3c),
       |${gramCte(5, "g5")},
       |g5c AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
       |g5agg AS (SELECT doc_id,
       |    sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dup5_chars
       |  FROM g5c GROUP BY 1),
       |m AS (
       |  SELECT d.doc_id,
       |    CASE WHEN lagg.n_lines = 0 THEN 0.0 ELSE lagg.dup_lines * 1.0 / lagg.n_lines END AS dlf,
       |    CASE WHEN d.tc = 0 THEN 0.0 ELSE lagg.dup_line_chars * 1.0 / d.tc END AS dlcf,
       |    CASE WHEN d.tc = 0 THEN 0.0 ELSE coalesce(t2.top2_chars, 0) * 1.0 / d.tc END AS t2f,
       |    CASE WHEN d.tc = 0 THEN 0.0 ELSE coalesce(t3.top3_chars, 0) * 1.0 / d.tc END AS t3f,
       |    CASE WHEN d.tc = 0 THEN 0.0 ELSE coalesce(g5agg.dup5_chars, 0) * 1.0 / d.tc END AS d5f
       |  FROM d
       |  JOIN lagg ON d.doc_id = lagg.doc_id
       |  LEFT JOIN (SELECT * FROM g2top WHERE rk = 1) t2 ON d.doc_id = t2.doc_id
       |  LEFT JOIN (SELECT * FROM g3top WHERE rk = 1) t3 ON d.doc_id = t3.doc_id
       |  LEFT JOIN g5agg ON d.doc_id = g5agg.doc_id)
       |SELECT doc_id,
       |  round(dlf, 4) AS dup_line_frac,
       |  round(dlcf, 4) AS dup_line_char_frac,
       |  round(t2f, 4) AS top2gram_char_frac,
       |  round(t3f, 4) AS top3gram_char_frac,
       |  round(d5f, 4) AS dup5gram_char_frac,
       |  (dlf > $MaxDupLineFrac OR dlcf > $MaxDupLineCharFrac
       |   OR t2f > $MaxTop2GramCharFrac OR t3f > $MaxTop3GramCharFrac
       |   OR d5f > $MaxDup5GramCharFrac) AS is_repetitive
       |FROM m ORDER BY doc_id""".stripMargin
  }
}

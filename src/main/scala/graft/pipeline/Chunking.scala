package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Document chunking — training-sequence preparation: split each document
  * into fixed-size token windows with a configurable stride (overlap =
  * window − stride), the standard shape for packing long documents into
  * bounded-context training rows.
  *
  * Definition (flatMap producer and oracle CTE must agree): tokens =
  * split on single space keeping empties; window starts at 0, stride,
  * 2·stride, … while start < n_tokens; a chunk is the next `window`
  * tokens re-joined with single spaces, the last chunk may be shorter
  * (tail windows are kept — dropping short tails is a downstream filter,
  * not a chunking concern); chunk_id = start / stride.
  *
  * Scale design: a document's chunks are a pure function of its own text,
  * so chunking is ONE typed flatMap pass — no shuffle, no window, output
  * rows stream straight to the sink. Row growth is deliberate and bounded
  * (≤ ⌈n/stride⌉ per doc); at 100 TB the only knob that matters is
  * writing the output partitioned the same way it arrived, which a
  * map-only plan preserves for free.
  */
object Chunking {

  val DefaultWindow = 32
  val DefaultStride = 24

  /** (doc_id, chunk_id, n_tokens, chunk) rows. */
  def chunk(spark: SparkSession, sfDir: String,
      window: Int = DefaultWindow, stride: Int = DefaultStride): DataFrame =
    chunkOf(Tables.documents(spark, sfDir), window, stride)

  /** [[chunk]] over any (doc_id, text) frame. */
  def chunkOf(docs: DataFrame, window: Int = DefaultWindow,
      stride: Int = DefaultStride): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        Iterator.range(0, t.length, stride).map { start =>
          val end = math.min(start + window, t.length)
          (id, (start / stride).toLong, (end - start).toLong,
            t.slice(start, end).mkString(" "))
        }
      }
      .toDF("doc_id", "chunk_id", "n_tokens", "chunk")
      .orderBy("doc_id", "chunk_id")
  }

  /** DuckDB oracle — identical windows via list slicing (DuckDB slices
    * are 1-based inclusive and clamp at the list end, matching the JVM
    * `slice(start, min(start+window, n))`).
    */
  def chunkSql(window: Int = DefaultWindow, stride: Int = DefaultStride): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |starts AS (
       |  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, $stride)) AS s
       |  FROM toks)
       |SELECT doc_id, s // $stride AS chunk_id,
       |  least($window, len(t) - s) AS n_tokens,
       |  array_to_string(t[s + 1 : s + $window], ' ') AS chunk
       |FROM starts ORDER BY doc_id, chunk_id""".stripMargin
}

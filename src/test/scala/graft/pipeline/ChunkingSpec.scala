package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Invariants for document chunking: window/stride layout, tail handling,
  * reconstruction (every token position covered), and the short-doc case.
  */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunksOf(text: String, window: Int, stride: Int) =
    Chunking.chunkOf(Seq((1L, text)).toDF("doc_id", "text"), window, stride)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))

  test("10 tokens, window 4, stride 3: starts 0,3,6,9 with a short tail") {
    val text = (0 until 10).map(i => s"t$i").mkString(" ")
    val got = chunksOf(text, window = 4, stride = 3)
    assert(got === Array(
      (0L, 4L, "t0 t1 t2 t3"),
      (1L, 4L, "t3 t4 t5 t6"),
      (2L, 4L, "t6 t7 t8 t9"),
      (3L, 1L, "t9")))
  }

  test("doc shorter than the window is one whole-doc chunk") {
    val got = chunksOf("a b c", window = 32, stride = 24)
    assert(got === Array((0L, 3L, "a b c")))
  }

  test("stride == window tiles without overlap and covers every token once") {
    val n = 100
    val text = (0 until n).map(i => s"w$i").mkString(" ")
    val got = chunksOf(text, window = 8, stride = 8)
    assert(got.map(_._2).sum === n, "token counts must tile the doc exactly")
    assert(got.map(_._3).mkString(" ") === text, "concatenated tiles rebuild the doc")
  }

  test("every chunk on the real table respects the window bound and count") {
    val out = Chunking.chunk(spark, "/root/testdata/sf0.001").cache()
    assert(out.where(col("n_tokens") > Chunking.DefaultWindow).count() === 0)
    assert(out.where(size(split(col("chunk"), " ")) =!= col("n_tokens")).count() === 0)
    // chunk counts per doc: ceil(n_tokens_doc / stride)
    val perDoc = out.groupBy("doc_id").count()
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val bad = perDoc.join(docs, "doc_id")
      .where(col("count") =!= ceil(col("n").cast("double") / Chunking.DefaultStride))
      .count()
    assert(bad === 0)
  }
}

package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Invariants for the Gopher repetition filters, on planted fixtures with
  * hand-computed expected fractions.
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def profile(text: String) = {
    val row = Repetition.repetitionOf(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    (row.getDouble(1), row.getDouble(2), row.getDouble(3), row.getDouble(4),
      row.getDouble(5), row.getBoolean(6))
  }

  test("duplicate lines: 4 lines, 'spam' three times") {
    // lines: spam, spam, spam, ok → dup_line_frac = 2/4; dup line chars =
    // 2*4 = 8 of length 17 text (3*4 + 2 + 3 newlines)
    val (dlf, dlcf, _, _, _, _) = profile("spam\nspam\nspam\nok")
    assert(dlf === 0.5)
    assert(dlcf === math.rint(8.0 / 17 * 10000) / 10000)
  }

  test("top-2-gram fraction: 'go go go go' is dominated by 'go go'") {
    // 2-grams: "go go" ×3; top2_chars = 3*5 = 15 over 11 chars → > 1 is
    // impossible here: 15/11 ≈ 1.36 (overlap overcount is the documented
    // contract for dup grams; top-gram can also exceed 1 on tiny docs)
    val (_, _, t2, _, _, flag) = profile("go go go go")
    assert(t2 === math.rint(15.0 / 11 * 10000) / 10000)
    assert(flag, "a 4-token repetition loop must be flagged")
  }

  test("clean text with a single trivial repeat is not flagged") {
    // long enough that a count-1 top gram stays under the char-fraction
    // bounds (the published thresholds assume real-length documents)
    val text = "the quick brown fox jumps over the lazy dog while nothing repeats here today " +
      "because every additional clause keeps introducing genuinely fresh vocabulary and " +
      "no span of adjacent words ever appears twice anywhere in this entire document"
    val (dlf, dlcf, t2, t3, d5, flag) = profile(text)
    assert(dlf === 0.0 && dlcf === 0.0 && d5 === 0.0)
    assert(t2 <= 0.2 && t3 <= 0.18)
    assert(!flag)
  }

  test("duplicated 5-gram fraction counts every occurrence of a repeated block") {
    // "a b c d e" repeated twice with filler: the 5-gram "a b c d e"
    // occurs twice (plus bridging grams occurring once)
    val text = "a b c d e x y z a b c d e"
    val (_, _, _, _, d5, _) = profile(text)
    // duplicated 5-gram: "a b c d e" ×2, len 9 ⇒ 18; text length 25
    assert(d5 === math.rint(18.0 / 25 * 10000) / 10000)
  }

  test("single line, no newline: line metrics are zero, flag driven by grams only") {
    val (dlf, dlcf, _, _, _, _) = profile("just one line of text")
    assert(dlf === 0.0 && dlcf === 0.0)
  }
}

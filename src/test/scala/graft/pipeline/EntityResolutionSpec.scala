package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Deletion-neighborhood blocking must be recall-COMPLETE for Levenshtein
  * distance ≤ 1 — substitutions at EVERY position (including the first,
  * which prefix blocking misses), insertions/deletions across unequal
  * lengths, and exact duplicates — and must never emit a distance-2 pair.
  */
class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pairs(names: (Long, String)*): Set[(Long, Long, Long)] = {
    import spark.implicits._
    EntityResolution.pairsFor(names.toDF("ck", "name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("finds substitutions at every position, including the first char") {
    val got = pairs(
      1L -> "alpha#001",
      2L -> "alpha#002", // differs from 1 at the LAST position
      3L -> "alpha#101", // differs from 1 at a MIDDLE position
      4L -> "blpha#001", // differs from 1 at the FIRST position
      5L -> "zzzzz#999") // far from everything
    assert(got === Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L)))
  }

  test("finds insertions/deletions across unequal lengths, rejects distance 2") {
    val got = pairs(
      1L -> "alpha#001",
      2L -> "alpha#022",  // distance 2 (two substitutions) — rejected
      3L -> "alpha#0011", // 1 longer: one INSERTION — distance 1, found
      4L -> "alph#001",   // 1 shorter: one DELETION — distance 1, found
      5L -> "alpha#001x9") // 2 longer — rejected (no variant can collide)
    assert(got === Set((1L, 3L, 1L), (1L, 4L, 1L)))
  }

  test("exact duplicate names collapse to one distance-0 row") {
    val got = pairs(1L -> "same#name", 2L -> "same#name")
    assert(got === Set((1L, 2L, 0L)))
  }

  test("matches the brute-force all-pairs answer on a low-entropy corpus") {
    // deterministic names over a 3-letter alphabet with MIXED lengths
    // (5/6/7) force many near-collisions across every edit type; brute
    // force is the ground truth
    val names = (0L until 60L).map { i =>
      val len = 5 + (i % 3).toInt
      val s = (0 until len).map { j =>
        ('a' + (math.abs(i * 31 + j * 17 + (i * j) % 7) % 3)).toChar
      }.mkString
      i -> s
    }
    val want = (for {
      a <- names; b <- names if a._1 < b._1
      d = levenshtein(a._2, b._2) if d <= 1
    } yield (a._1, b._1, d.toLong)).toSet
    val got = pairs(names: _*)
    assert(got === want, "blocked result must equal brute force")
  }

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}

package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Invariants for the benchmark-decontamination operator: planted overlap
  * detection, side discipline (pairs always cross corpus×eval), the df
  * cap, and the short-doc whole-text n-gram convention.
  */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("a corpus doc sharing an 8-token span with an eval doc is flagged; unrelated docs are not") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = docs(
      1L -> s"leading tokens $span trailing stuff here",
      7L -> s"$span completely different tail words",
      2L -> "nothing in common with anything else at all",
      17L -> "another eval doc with fully disjoint content")
    val out = Decontaminate.overlapsOf(df).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 7L)))
    // exactly the one shared 8-gram
    assert(out.head.getLong(2) === 1L)
  }

  test("pairs always cross sides: corpus_id never in the eval slice, eval_id always") {
    val out = Decontaminate.overlaps(spark, "/root/testdata/sf0.001").cache()
    assert(out.where(col("corpus_id") % 10 === 7).count() === 0)
    assert(out.where(col("eval_id") % 10 =!= 7).count() === 0)
    assert(out.where(col("n_shared") < 1).count() === 0)
  }

  test("n-grams above the per-side df cap generate no pairs") {
    val hot = (1 to 8).map(i => s"h$i").mkString(" ")
    // the hot 8-gram sits in MaxNgramDf+1 corpus docs (ids ≡ 0/n mod 10,
    // never 7) and one eval doc — corpus-side cap must kill it even though
    // the eval side is under cap
    val corpus = (0 to Decontaminate.MaxNgramDf).map { i =>
      (i * 10L) -> s"doc $i says $hot"
    }
    val eval = Seq(7L -> s"eval copy of $hot")
    val out = Decontaminate.overlapsOf(docs(corpus ++ eval: _*))
    assert(out.count() === 0)
  }

  test("docs shorter than n match on whole-text equality only") {
    val df = docs(
      3L -> "tiny doc", // < 8 tokens ⇒ the whole text is the one n-gram
      7L -> "tiny doc",
      27L -> "tiny dog")
    val out = Decontaminate.overlapsOf(df).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((3L, 7L)))
  }

  test("Bloom-prefiltered variant returns the EXACT frame of the unfiltered one") {
    // no false negatives in a Bloom filter + downstream eval-side gate ⇒
    // the prefilter may only drop rows that could never pair. Checked on
    // the real table (broad) and on a planted fixture (targeted)
    val exact = Decontaminate.overlaps(spark, "/root/testdata/sf0.001").collect()
    val bloom = Decontaminate.overlapsBloom(spark, "/root/testdata/sf0.001").collect()
    assert(bloom.map(_.toSeq).toSeq === exact.map(_.toSeq).toSeq)
    assert(exact.nonEmpty, "fixture should produce at least one overlap")

    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = docs(
      1L -> s"leading tokens $span trailing stuff here",
      7L -> s"$span completely different tail words",
      2L -> "nothing in common with anything else at all")
    val out = Decontaminate.overlapsBloomOf(df).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 7L)))
  }

  test("semantic variant: eval slice broadcasts; corpus embeddings never shuffle pre-flag") {
    val df = Decontaminate.semantic(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the similarity condition with a broadcast side must plan as a
    // BroadcastNestedLoopJoin - the corpus scan feeds it map-side; the
    // only exchange below the final sort is the flagged-ids aggregate
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"eval side must broadcast:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty, "the fixture corpus must flag someone")
    // flagged ids are never from the eval slice itself
    assert(rows.forall(r => r.getLong(0) % 20 != 7))
    assert(rows.forall(r => r.getLong(1) >= 1L))
  }
}

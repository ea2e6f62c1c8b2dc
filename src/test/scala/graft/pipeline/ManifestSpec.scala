package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** The training manifest must be a pure function of (corpus, weights,
  * capacity): cover every mixture replica exactly once, pack a gapless
  * token stream, and reproduce bit-identically across runs.
  */
class ManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("manifest covers the mixture replicas exactly, stream is gapless") {
    val m = Manifest.trainManifest(spark, sfDir).cache()
    val reps = Sampling.epochsUpsample(spark, sfDir)
    assert(m.count() === reps.count(), "one manifest row per mixture replica")
    assert(m.select("doc_id", "copy").except(reps.select("doc_id", "copy")).count() === 0)
    // gapless exclusive prefix sum: every row starts where the previous
    // ended, and the stream's total length is the sum of its parts
    val rows = m.select("start_offset", "n_tokens").orderBy("start_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.sliding(2).foreach {
      case Array((s0, n0), (s1, _)) => assert(s1 === s0 + n0, "gap in stream")
      case _ => ()
    }
    // step is the window containing the replica's first token
    m.collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(5) / Packing.DefaultCapacity)
    }
    m.unpersist()
  }

  test("manifest is deterministic across runs and shuffles the corpus order") {
    val a = Manifest.trainManifest(spark, sfDir).collect().toSeq
    val b = Manifest.trainManifest(spark, sfDir).collect().toSeq
    assert(a === b, "manifest must reproduce bit-identically")
    // the seeded shuffle must actually shuffle: stream order != doc_id order
    val streamIds = a.map(_.getLong(1))
    assert(streamIds !== streamIds.sorted, "manifest is in raw corpus order")
  }

  test("extension keeps every published row byte-for-byte and appends at the end") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val oldDocs = docs.where(col("doc_id") % 10 =!= 0)
    val newDocs = docs.where(col("doc_id") % 10 === 0)
    val base = Manifest.trainManifestOf(oldDocs).cache()
    val extended = Manifest.extendManifest(base, newDocs).cache()
    val baseRows = base.collect().map(_.toSeq).toSet
    val extRows = extended.collect().map(_.toSeq).toSet
    // the append-only contract: the base manifest is a strict subset,
    // unchanged — already-consumed steps keep their data
    assert(baseRows.subsetOf(extRows), "extension rewrote published rows")
    val added = extended.where(col("doc_id") % 10 === 0)
    assert(extRows.size.toLong === baseRows.size.toLong + added.count())
    // new rows start exactly at the sealed seam: the capacity boundary
    // after the base end, never inside the base's final (possibly
    // already-consumed-with-padding) step
    val cap = Packing.DefaultCapacity
    val baseEnd = base.agg(max(col("start_offset") + col("n_tokens")))
      .head.getLong(0)
    val seam = ((baseEnd + cap - 1) / cap) * cap
    assert(added.agg(min("start_offset")).head.getLong(0) === seam,
      "extension must start at the capacity boundary after the base end")
    // therefore resume-at-the-seam-step sees ALL extension rows: none can
    // hide inside a step the base already finished
    val seamStep = seam / cap
    assert(added.where(col("step") < seamStep).count() === 0L)
    base.unpersist(); extended.unpersist()
  }

  test("resume at step S: the remaining slice is a filter, not a recompute") {
    val m = Manifest.trainManifest(spark, sfDir).cache()
    val cap = Packing.DefaultCapacity
    val s = 5L
    val remaining = m.where(col("start_offset") + col("n_tokens") > s * cap)
    // every replica wholly consumed before step S is excluded, every one
    // overlapping or after the resume point is kept — counts must add up
    val consumed = m.where(col("start_offset") + col("n_tokens") <= s * cap)
    assert(remaining.count() + consumed.count() === m.count())
    assert(remaining.agg(min("start_offset")).head.getLong(0) <= s * cap)
    m.unpersist()
  }
}

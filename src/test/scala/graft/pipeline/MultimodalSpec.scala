package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Multimodal plumbing: the mapPartitions feature-extraction stage must
  * agree with the column-arithmetic oracle surface, stay deterministic,
  * and frame sampling must multiply rows exactly.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("mapPartitions feature extraction matches the column-arithmetic surface") {
    val a = Multimodal.assets(spark, sfDir).cache()
    val viaPartitions = Multimodal.extractFeatures(spark, a)
      .select("asset_id", "width", "height")
    val viaColumns = Multimodal.features(spark, sfDir)
      .select("asset_id", "width", "height")
    assert(viaPartitions.exceptAll(viaColumns).count() === 0)
    assert(viaColumns.exceptAll(viaPartitions).count() === 0)
  }

  test("stub fingerprint is deterministic across runs") {
    val a = Multimodal.assets(spark, sfDir)
    val f1 = Multimodal.extractFeatures(spark, a).select("asset_id", "fingerprint")
    val f2 = Multimodal.extractFeatures(spark, a).select("asset_id", "fingerprint")
    assert(f1.exceptAll(f2).count() === 0)
  }

  test("frame dedup finds every planted clipped copy with high overlap") {
    val out = Multimodal.frameDedup(spark, sfDir).cache()
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every planted clip (doc + 1e6, first two frames removed) must pair
    // with its source at full overlap of the smaller signature set
    val clipPairs = rows.filter { case (a, b, _, _) => b - a == 1000000L }
    assert(clipPairs.nonEmpty, "planted clips must surface")
    clipPairs.foreach { case (a, b, _, permille) =>
      assert(permille >= 900L, s"clip pair ($a,$b) overlap only $permille")
    }
    // permille is integer-exact and bounded
    rows.foreach { case (_, _, n, p) =>
      assert(p >= 500L && p <= 1000L && n > 0)
    }
  }

  test("frame dedup plan: inverted signature join, no cartesian, content never shuffles") {
    val s2 = graft.testkit.SparkTestSession.isolated()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = Multimodal.frameDedup(s2, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"pair source must be the signature-keyed join:\n$plan")
    // the frame CONTENT must not cross the pair-join shuffle: every
    // exchange below the join carries (asset_id, sig)-shaped rows only
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("piece")),
      s"frame content leaked into a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("frame sampling emits exactly ceil(n_frames/stride) rows per asset") {
    val a = Multimodal.assets(spark, sfDir)
    val frames = Multimodal.frameSample(a, stride = 10)
    val bad = frames.groupBy("asset_id", "n_frames")
      .agg(count(lit(1)).as("n_sampled"))
      .where(col("n_sampled") =!= ceil(col("n_frames").cast("double") / 10).cast("long"))
      .count()
    assert(bad === 0)
    // frame indices respect the stride grid and stay in range
    assert(frames.where(col("frame_idx") % 10 =!= 0).count() === 0)
    assert(frames.where(col("frame_idx") >= col("n_frames")).count() === 0)
  }
}

package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Multimodal over a REAL codec: the `javax.imageio` encode→decode round
  * trip must be lossless (decoded pixels equal the generator's closed
  * form, for PNG and BMP alike), features and frame signatures must be
  * computed from decoded bytes, and the frame-dedup join must catch
  * every planted clipped copy without shuffling media bytes.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("PNG and BMP round trips are lossless: decoded pixels equal the generator") {
    import Multimodal.Codec
    for (id <- Seq(4L, 7L)) { // one even (png), one odd (bmp)
      val nf = Codec.framesOf(id)
      val img = Codec.decode(Codec.encode(id, 0, nf, Codec.formatOf(id)))
      assert(img.getWidth === Codec.widthOf(id))
      assert(img.getHeight === Codec.BandH * nf)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert((img.getRGB(x, y) & 0xffffff) === Codec.pixel(id, x, y),
          s"pixel ($x,$y) of asset $id survived the codec changed")
    }
  }

  test("decoded features match the generator's closed form") {
    import Multimodal.Codec
    val got = Multimodal.extractFeatures(spark, Multimodal.assets(spark, sfDir))
      .select("asset_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.size === 500)
    for (id <- Seq(0L, 13L, 255L, 499L)) {
      val w = Codec.widthOf(id); val h = Codec.BandH * Codec.framesOf(id)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val p = Codec.pixel(id, x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      assert(got(id) === ((w, h, sr, sg, sb)), s"asset $id")
    }
  }

  test("decode-based fingerprint is deterministic across runs") {
    val a = Multimodal.assets(spark, sfDir)
    val f1 = Multimodal.extractFeatures(spark, a).select("asset_id", "fingerprint")
    val f2 = Multimodal.extractFeatures(spark, a).select("asset_id", "fingerprint")
    assert(f1.exceptAll(f2).count() === 0)
  }

  test("frame dedup finds every planted clipped copy at exact full overlap") {
    val out = Multimodal.frameDedup(spark, sfDir).cache()
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every planted clip (doc + 1e6, first two frames removed) must pair
    // with its source; since every clip band decodes pixel-identical to
    // its source band, overlap of the smaller set is exactly 1000
    val clipPairs = rows.filter { case (a, b, _, _) => b - a == 1000000L }
    val expected = (0L until 500L)
      .filter(id => id % 37 == 0 && Multimodal.Codec.framesOf(id) >= 3)
    assert(clipPairs.map(_._1).sorted.toSeq === expected.toSeq,
      "exactly the planted clips must surface as source->clip pairs")
    clipPairs.foreach { case (a, b, _, permille) =>
      assert(permille === 1000L, s"clip pair ($a,$b) overlap $permille")
    }
    rows.foreach { case (_, _, n, p) =>
      assert(p >= 500L && p <= 1000L && n > 0)
    }
  }

  test("frame dedup plan: inverted signature join, no cartesian, media never shuffles") {
    val s2 = graft.testkit.SparkTestSession.isolated()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = Multimodal.frameDedup(s2, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"pair source must be the signature-keyed join:\n$plan")
    // the media BYTES must not cross the pair-join shuffle: signatures
    // are extracted map-side, so every exchange carries (asset_id, sig)
    // rows only
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("media")),
      s"media bytes leaked into a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("frame sampling emits exactly ceil(n_frames/stride) rows per asset") {
    val stride = 3
    val frames = Multimodal.frameSampleQuery(spark, sfDir, stride = stride)
    val bad = frames.groupBy("asset_id", "n_frames")
      .agg(count(lit(1)).as("n_sampled"))
      .where(col("n_sampled") =!=
        ceil(col("n_frames").cast("double") / stride).cast("long"))
      .count()
    assert(bad === 0)
    // frame indices respect the stride grid and stay in range
    assert(frames.where(col("frame_idx") % stride =!= 0).count() === 0)
    assert(frames.where(col("frame_idx") >= col("n_frames")).count() === 0)
  }
}

package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Audio over a REAL RIFF/WAVE codec: the encode→decode round trip must
  * be lossless (decoded samples equal the generator, with and without
  * the planted LIST chunk), the parser must be a genuine chunk walk
  * (malformed streams refuse loudly), and the query stages must compute
  * from decoded samples.
  */
class AudioSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  import Audio.Codec

  test("WAV round trip is lossless, with and without the LIST chunk") {
    for (id <- Seq(6L, 7L)) { // id 6: LIST chunk + 8 kHz; id 7: plain + 16 kHz
      val s = Array.tabulate(Codec.nSamplesOf(id))(Codec.sample(id, _))
      val bytes = Codec.encode(s, Codec.rateOf(id), Codec.hasListChunk(id))
      val (rate, back) = Codec.decode(bytes)
      assert(rate === Codec.rateOf(id))
      assert(back.toSeq === s.toSeq, s"asset $id changed through the container")
    }
  }

  test("negative samples survive the PCM16 two's-complement round trip") {
    val s = Array(-32760, -1, 0, 1, 32760, -3)
    val (_, back) = Codec.decode(Codec.encode(s, 8000, withList = true))
    assert(back.toSeq === s.toSeq)
  }

  test("the parser is a chunk walk that refuses malformed streams loudly") {
    val good = Codec.encode(Array(1, 2, 3, 4), 8000, withList = false)
    // wrong magic
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](Codec.decode(notRiff))
    // a chunk whose declared size overruns the stream
    assertThrows[IllegalArgumentException](Codec.decode(good.take(30)))
    // stereo is refused, not silently mis-decoded
    val stereo = good.clone(); stereo(22) = 2
    assertThrows[IllegalArgumentException](Codec.decode(stereo))
  }

  test("voiced windows always clear the silence threshold") {
    // the decoded-domain rule (max |s| < 16) must recover exactly the
    // generator's window labels; a voiced window hiding under the
    // threshold would silently desynchronize the oracle
    for (id <- 0L until 200L; w <- 0 until Codec.nSamplesOf(id) / Audio.WindowSamples) {
      val mx = (w * Audio.WindowSamples until (w + 1) * Audio.WindowSamples)
        .map(i => math.abs(Codec.sample(id, i))).max
      val voiced = (id + w) % 5 >= 2
      assert(voiced === (mx >= Audio.SilenceMaxAbs),
        s"window $w of asset $id: generator label and decoded rule disagree")
    }
  }

  test("features compute from decoded bytes and match a hand-built case") {
    val df = Audio.features(spark, sfDir)
    val row = df.filter(df("asset_id") === 6L).collect().head
    val s = Array.tabulate(Codec.nSamplesOf(6L))(Codec.sample(6L, _))
    assert(row.getAs[Int]("sample_rate") === 8000)
    assert(row.getAs[Int]("n_samples") === s.length)
    assert(row.getAs[Int]("duration_ms") === s.length * 1000 / 8000)
    assert(row.getAs[Int]("peak") === s.map(math.abs).max)
    assert(row.getAs[Long]("sum_sq") === s.map(v => v.toLong * v).sum)
    assert(row.getAs[Int]("zero_crossings") ===
      (1 until s.length).count(i => (s(i) >= 0) != (s(i - 1) >= 0)))
  }

  test("silence runs are the generator's window labels, gaps-and-islands") {
    val df = Audio.silence(spark, sfDir)
    val row = df.filter(df("asset_id") === 10L).collect().head
    val nWin = Codec.nSamplesOf(10L) / Audio.WindowSamples
    val labels = (0 until nWin).map(w => (10L + w) % 5 < 2)
    assert(row.getAs[Int]("n_windows") === nWin)
    assert(row.getAs[Int]("silent_windows") === labels.count(identity))
    val best = labels.foldLeft((0, 0)) { case ((run, bst), s) =>
      if (s) (run + 1, math.max(bst, run + 1)) else (0, bst)
    }._2
    assert(row.getAs[Int]("longest_run") === best)
  }

  test("downsample output survives a second-generation container round trip") {
    val df = Audio.downsample(spark, sfDir)
    val row = df.filter(df("asset_id") === 3L).collect().head
    val s = Array.tabulate(Codec.nSamplesOf(3L))(Codec.sample(3L, _))
    val out = Array.tabulate(s.length / 2)(j => Math.floorDiv(s(2 * j) + s(2 * j + 1), 2))
    assert(row.getAs[Int]("out_rate") === Codec.rateOf(3L) / 2)
    assert(row.getAs[Int]("n_out") === out.length)
    assert(row.getAs[Int]("peak_out") === out.map(math.abs).max)
    assert(row.getAs[Long]("checksum") ===
      out.zipWithIndex.map { case (v, j) => v.toLong * (j + 1) }.sum)
  }
}

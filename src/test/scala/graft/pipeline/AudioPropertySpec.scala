package graft.pipeline

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.PropertyChecks

/** Property checks for the RIFF/WAVE codec against arbitrary PCM16
  * signals — sign boundaries, extreme amplitudes, tiny/empty payloads
  * and both chunk layouts, the corners a fixed generator formula never
  * wanders into.
  */
class AudioPropertySpec extends AnyFunSuite with PropertyChecks {

  override protected val propertyIterations: Int = 40

  private val signalGen: Gen[(Array[Int], Int, Boolean)] = for {
    n <- Gen.oneOf(0, 1, 2, 3, 17, 256, 1000)
    samples <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(-32768, 32767),
      Gen.oneOf(-32768, -1, 0, 1, 32767))) // bias toward the boundaries
    rate <- Gen.oneOf(8000, 16000, 44100)
    withList <- Gen.oneOf(true, false)
  } yield (samples.toArray, rate, withList)

  test("any PCM16 signal round-trips the container bit-exactly") {
    forAll(signalGen) { case (samples, rate, withList) =>
      val (backRate, back) =
        Audio.Codec.decode(Audio.Codec.encode(samples, rate, withList))
      assert(backRate === rate)
      assert(back.toSeq === samples.toSeq)
    }
  }

  test("truncating an encoded stream anywhere inside a chunk refuses loudly") {
    forAll(signalGen) { case (samples, rate, withList) =>
      val bytes = Audio.Codec.encode(samples, rate, withList)
      // cut inside the data chunk's declared extent (or the header)
      val cut = math.max(1, bytes.length - 1 - samples.length)
      assertThrows[IllegalArgumentException](
        Audio.Codec.decode(bytes.take(cut)))
    }
  }
}

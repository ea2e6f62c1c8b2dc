package graft.pipeline

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.{PropertyChecks, SparkTestSession}

/** Property checks for the two-phase stratified selection and the chunking
  * layout against independent driver-side reference implementations — the
  * boundary-bucket remainder logic and tail-window arithmetic are exactly
  * the kind of off-by-one habitat a fixed fixture can miss.
  */
class SamplingPropertySpec extends AnyFunSuite with PropertyChecks {
  private lazy val spark = SparkTestSession.spark

  override protected val propertyIterations: Int = 8

  // skewed strata: 1-4 strata with wildly different sizes, sparse ids
  private val frameGen: Gen[(List[(Long, String)], Double)] = for {
    nStrata <- Gen.choose(1, 4)
    sizes <- Gen.listOfN(nStrata, Gen.oneOf(1, 2, 7, 40, 300))
    frac <- Gen.oneOf(0.01, 0.1, 0.33, 0.5, 0.99, 1.0)
  } yield {
    var id = 0L
    val rows = sizes.zipWithIndex.flatMap { case (sz, s) =>
      (0 until sz).map { _ =>
        id += 7 // sparse, non-contiguous ids
        (id, s"lang$s")
      }
    }
    (rows, frac)
  }

  test("stratified sample equals the driver-side reference selection for random frames") {
    import spark.implicits._
    forAll(frameGen) { case (rows, frac) =>
      val df = rows.toDF("doc_id", "lang")
      val got = Sampling.stratifiedSampleOf(df, frac)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // reference: per stratum, the ceil(frac·n) smallest (hash, id) pairs
      val hashed = rows.map { case (id, lang) => (id, lang, Sampling.sampleHashJvm(id)) }
      val expected = hashed.groupBy(_._2).flatMap { case (_, rs) =>
        val quota = math.ceil(frac * rs.size).toLong.toInt
        rs.sortBy(r => (r._3, r._1)).take(quota).map(_._1)
      }.toSet
      assert(got === expected, s"frac=$frac strata=${rows.map(_._2).distinct}")
    }
  }

  test("chunking tiles arbitrary window/stride combinations correctly") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      window <- Gen.choose(1, 12)
      stride <- Gen.choose(1, window)
    } yield (n, window, stride)
    forAll(gen) { case (n, window, stride) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val got = Chunking.chunkOf(Seq((1L, text)).toDF("doc_id", "text"), window, stride)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      val t = text.split(" ", -1)
      val expected = Iterator.range(0, t.length, stride).map { start =>
        val end = math.min(start + window, t.length)
        ((start / stride).toLong, (end - start).toLong, t.slice(start, end).mkString(" "))
      }.toArray
      assert(got === expected, s"n=$n window=$window stride=$stride")
    }
  }
}

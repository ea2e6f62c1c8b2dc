package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Invariants for the vocabulary-coverage curve, the linear quality-model
  * margin, and the fractional epoch upsampler.
  */
class VocabQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs = graft.sources.Tables.documents(spark, sfDir)
    .select("doc_id", "source", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("coverage curve is monotone, matches a driver recount, ends ≤ 1") {
    val rows = Vocab.coverage(spark, sfDir).collect()
    val termCounts = docs.flatMap(_._3.split(" ", -1))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    // this corpus has a small closed vocabulary — the curve covers all of it
    assert(rows.length === math.min(50, termCounts.size))
    val expect = termCounts.toSeq.sortBy { case (t, c) => (-c, t) }.take(50)
    var cum = 0L
    rows.sortBy(_.getInt(0)).zip(expect).foreach { case (r, (t, c)) =>
      cum += c
      assert(r.getString(1) === t)
      assert(r.getLong(2) === c)
      assert(r.getLong(3) === cum)
    }
    val cov = rows.sortBy(_.getInt(0)).map(_.getDouble(4))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage monotone")
    assert(cov.last <= 1.0)
  }

  test("quality margin matches a driver-side recomputation of the linear model") {
    val got = QualityModel.score(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val stop = Set("the", "a", "of", "to", "and", "in", "is", "it")
    docs.foreach { case (id, _, text) =>
      val t = text.split(" ", -1)
      val fLen = math.min(t.length, 1000).toDouble / 1000
      val fDistinct = t.distinct.length.toDouble / t.length
      val fStopword = t.count(stop).toDouble / t.length
      val fAvgLen = text.replace(" ", "").length.toDouble / t.length / 10
      // HALF_UP on the decimal value = round half AWAY FROM ZERO — what
      // both Spark's round() and DuckDB's round() do (math.round would
      // round -x.5 toward positive instead)
      def r(x: Double): Long =
        BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val marginU = math.round(QualityModel.Bias * 1e6) +
        r(fLen * QualityModel.WLen * 1e6) +
        r(fDistinct * QualityModel.WDistinct * 1e6) +
        r(fStopword * QualityModel.WStopword * 1e6) +
        r(fAvgLen * QualityModel.WAvgLen * 1e6)
      val margin = BigDecimal(marginU / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) === ((margin, marginU >= math.round(0.55 * 1e6))), s"doc $id")
    }
  }

  test("trained classifier: learns the planted rule well above chance on the held-out split") {
    val rows = QualityModel.trained(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.length === docs.length)
    // margins are nonzero somewhere — training moved the weights off zero
    assert(rows.exists(_._4 != 0L), "all-zero margins mean training never ran")
    // keep == (margin > 0) by construction
    rows.foreach { case (id, _, _, m, keep) => assert(keep === (m > 0L), s"doc $id") }
    // both splits present, labels balanced enough to make accuracy meaningful
    val test = rows.filter(_._2 == "test")
    val train = rows.filter(_._2 == "train")
    assert(test.nonEmpty && train.nonEmpty)
    assert(test.count(_._3 == 1L) > 0 && test.count(_._3 == -1L) > 0,
      "held-out split must contain both classes")
    def acc(xs: Array[(Long, String, Long, Long, Boolean)]): Double =
      xs.count { case (_, _, y, m, _) => y * m > 0 }.toDouble / xs.length
    // prototype accuracies: ~0.9 train / ~0.9 test at every SF; 0.75 is a
    // safe floor that still proves real learning (chance is ~0.5)
    assert(acc(train) > 0.75, s"train accuracy ${acc(train)}")
    assert(acc(test) > 0.75, s"test accuracy ${acc(test)}")
  }

  test("epoch upsampler emits the exact deterministic copy counts") {
    val out = Sampling.epochsUpsample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val copiesOf = out.groupBy(_._1).map { case (id, xs) => id -> xs.length }
    docs.foreach { case (id, source, _) =>
      val (full, pct) = Sampling.DefaultEpochs.getOrElse(source, (1, 0))
      val extra = if (Sampling.sampleHashJvm(id) % 100 < pct) 1 else 0
      assert(copiesOf(id) === full + extra, s"doc $id of $source")
    }
    // copy indices are 1..n per doc
    out.groupBy(_._1).foreach { case (id, xs) =>
      assert(xs.map(_._2).sorted.toSeq === (1 to xs.length).map(_.toLong), s"doc $id")
    }
  }

  test("zero-weight sources are dropped entirely (fractional weight 0.5 keeps ~half)") {
    // weight 0.5 = (0 full copies, 50% extra): a doc either appears once or
    // not at all — sequence(1, 0) must never leak [1, 0] rows
    val out = Sampling.epochsUpsample(spark, sfDir,
      epochs = Map("src0" -> (0, 0), "src1" -> (0, 50))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(!out.exists(_._2 == "src0"), "weight-0 source must vanish")
    val src1 = out.filter(_._2 == "src1")
    assert(src1.nonEmpty && src1.forall(_._3 == 1L), "kept docs appear exactly once")
    src1.foreach { case (id, _, _) =>
      assert(Sampling.sampleHashJvm(id) % 100 < 50, s"doc $id should have been dropped")
    }
    // unlisted sources keep default weight 1 (exactly one copy each)
    val others = out.filterNot(r => r._2 == "src0" || r._2 == "src1")
    assert(others.nonEmpty && others.forall(_._3 == 1L))
  }
}

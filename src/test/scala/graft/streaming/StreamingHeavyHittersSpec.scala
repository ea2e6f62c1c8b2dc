package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** The streaming sketch's whole value is its CONTRACT: the true count of
  * every reported key lies inside [min_count, max_count], every truly
  * heavy key is reported, `guaranteed` is never wrong, replayed
  * micro-batches are no-ops, and a restart (fresh read of the store)
  * continues from committed state.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 10

  // three micro-batches with a key (7) that is heavy overall but COLD in
  // batch 1 (the pre-tracking-miss case the bound exists for), a key (1)
  // heavy from the start, and noise keys
  private def batches: Seq[Seq[Long]] = Seq(
    Seq.fill(40)(1L) ++ (100L until 160L) ++ Seq(7L, 7L),
    Seq.fill(30)(1L) ++ Seq.fill(50)(7L) ++ (200L until 240L),
    Seq.fill(60)(7L) ++ (300L until 340L))

  private def driveAll(dir: String, parts: Int): Unit =
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingHeavyHitters.processBatch(
        spark.createDataset(b).repartition(parts).toDF("user_id"),
        dir, i.toLong, K)
    }

  test("bounds contain the exact recount; truly heavy keys always reported") {
    val dir = Files.createTempDirectory("graft-shh").toString
    driveAll(dir, parts = 4)
    val all = batches.flatten
    val n = all.size.toLong
    val exact = all.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
    val rows = StreamingHeavyHitters.report(spark, dir, K).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val trulyHeavy = exact.collect { case (kk, c) if c * K > n => kk }.toSet
    assert(trulyHeavy.nonEmpty && trulyHeavy.subsetOf(rows.keySet),
      s"missing heavy keys: ${trulyHeavy -- rows.keySet}")
    rows.foreach { case (kk, (mn, mx, guaranteed)) =>
      val truth = exact.getOrElse(kk, 0L)
      assert(mn <= truth && truth <= mx,
        s"key $kk: true $truth outside [$mn,$mx]")
      if (guaranteed) assert(truth * K > n, s"key $kk guaranteed but not heavy")
    }
    // key 1 was tracked from batch 0 → its count is EXACT (max_miss 0)
    assert(rows(1L)._1 === rows(1L)._2)
    assert(rows(1L)._1 === exact(1L))
  }

  test("a replayed micro-batch is a no-op") {
    val dir = Files.createTempDirectory("graft-shh2").toString
    driveAll(dir, parts = 3)
    val before = StreamingHeavyHitters.report(spark, dir, K).collect().toSeq
    // foreachBatch redelivery: same batchId, same (or corrupted) data
    StreamingHeavyHitters.processBatch(
      spark.createDataset(batches(1)).toDF("user_id"), dir, 1L, K)
    val after = StreamingHeavyHitters.report(spark, dir, K).collect().toSeq
    assert(after === before)
  }

  test("restart: a fresh reader sees exactly the committed state") {
    val dir = Files.createTempDirectory("graft-shh3").toString
    batches.zipWithIndex.take(2).foreach { case (b, i) =>
      StreamingHeavyHitters.processBatch(
        spark.createDataset(b).toDF("user_id"), dir, i.toLong, K)
    }
    val mid = StreamingHeavyHitters.report(spark, dir, K).collect().toSeq
    assert(mid.nonEmpty)
    // "restart" = continue from disk with the next batch
    StreamingHeavyHitters.processBatch(
      spark.createDataset(batches(2)).toDF("user_id"), dir, 2L, K)
    val fin = StreamingHeavyHitters.report(spark, dir, K).collect()
    val all = batches.flatten
    val exact7 = all.count(_ == 7L).toLong
    val row7 = fin.find(_.getLong(0) == 7L).get
    assert(row7.getLong(1) <= exact7 && exact7 <= row7.getLong(2))
  }
}

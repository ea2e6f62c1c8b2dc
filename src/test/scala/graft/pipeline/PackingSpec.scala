package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Invariants for the packing layout: offsets are the exclusive prefix sum
  * in doc_id order (verified against an independent driver recomputation),
  * bins are capacity-aligned, and the two-phase plan carries no global
  * single-partition exchange.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("offsets equal the exclusive prefix sum recomputed on the driver") {
    val got = Packing.packBins(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    var off = 0L
    got.sortBy(_._1).foreach { case (id, n, start, bin) =>
      assert(start === off, s"doc $id: start $start, expected $off")
      assert(bin === off / Packing.DefaultCapacity, s"doc $id bin")
      off += n
    }
  }

  test("bin token totals never exceed capacity + one spanning doc") {
    val cap = 64
    val out = Packing.packBinsOf(
      graft.sources.Tables.documents(spark, sfDir), capacity = cap)
    val bins = out.groupBy("bin_id").agg(sum("n_tokens").as("tok"),
      min("start_offset").as("mn")).collect()
    bins.foreach { r =>
      // a bin holds at most capacity tokens of docs that STARTED in it;
      // its first doc may have started before — but every start_offset in
      // the bin lies inside [bin*cap, (bin+1)*cap)
      val bin = r.getLong(0)
      assert(r.getLong(2) >= bin * cap && r.getLong(2) < (bin + 1) * cap)
    }
    // total conservation: Σ n_tokens == final offset
    val total = out.agg(max(col("start_offset") + col("n_tokens"))).head.getLong(0)
    assert(total === out.agg(sum("n_tokens")).head.getLong(0))
  }

  test("the plan has no single-partition global exchange") {
    val plan = Packing.packBins(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global prefix sum must not serialize into one partition:\n$plan")
  }

  test("offsets are independent of the incoming partition count") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = Packing.packBinsOf(docs.repartition(1)).collect().toSeq
    val b = Packing.packBinsOf(docs.repartition(13)).collect().toSeq
    assert(a === b)
  }
}

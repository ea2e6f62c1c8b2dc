package graft.core

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** The overlap helper's contract: input-order results, original-exception
  * propagation, the parallelism knob, and failure-path cancellation of
  * sibling in-flight Spark jobs (the round-15 advice: a failed takedown
  * leg must not leave orphan sibling jobs writing to stores while the
  * caller unwinds).
  */
class ParSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("results come back in input order, not completion order") {
    val got = Par.run(Seq(
      () => { Thread.sleep(150); "slow" },
      () => "fast"))
    assert(got === Seq("slow", "fast"))
  }

  test("the first failure propagates its original exception") {
    val boom = intercept[IllegalStateException] {
      Par.run[Unit](Seq(
        () => throw new IllegalStateException("leg down"),
        () => ()))
    }
    assert(boom.getMessage === "leg down")
  }

  test("spark.graft.par.parallelism bounds in-flight thunks") {
    spark.conf.set(Par.ParallelismConf, "2")
    try {
      val inFlight = new AtomicInteger
      val maxSeen = new AtomicInteger
      Par.run((1 to 6).map { _ => () =>
        val now = inFlight.incrementAndGet()
        maxSeen.updateAndGet(m => math.max(m, now))
        Thread.sleep(100)
        inFlight.decrementAndGet()
      })
      assert(maxSeen.get() <= 2,
        s"conf asked for 2 in flight, saw ${maxSeen.get()}")
    } finally spark.conf.unset(Par.ParallelismConf)
  }

  test("a failing thunk cancels sibling in-flight Spark jobs") {
    // sibling: a job that would run for minutes unless cancelled
    val slowSibling = () => {
      spark.range(0, 1000000L, 1, 4)
        .filter((id: java.lang.Long) => { Thread.sleep(1); id % 2 == 0 })
        .count()
      ()
    }
    val t0 = System.nanoTime()
    intercept[IllegalStateException] {
      Par.run[Unit](Seq(
        () => { Thread.sleep(300); throw new IllegalStateException("die") },
        slowSibling))
    }
    // the cancel fires before the rethrow; the sibling's job must drain
    // from the scheduler promptly instead of grinding on as an orphan
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (tracker.getActiveJobIds().nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(tracker.getActiveJobIds().isEmpty,
      "sibling job still active 30 s after the failing leg rethrew — " +
        "job-group cancellation did not reach it")
    val waited = (System.nanoTime() - t0) / 1e9
    assert(waited < 60, f"drain took $waited%.1f s")
  }
}

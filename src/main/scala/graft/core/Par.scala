package graft.core

import java.util.concurrent.{Callable, ExecutionException, Executors, ThreadFactory}

/** Overlap INDEPENDENT Spark actions from driver threads — the
  * optimization-guide §2.6 pattern ("actions are only sequential because
  * your driver code calls them sequentially"). The profiled query surface
  * is fixed-overhead bound, not compute bound: the hot lifecycle entries
  * run 30–120 sequential Spark jobs at 2–20% executor utilization, so the
  * wall clock is the SUM of per-job latencies while the cluster idles.
  * Submitting independent actions (store builds over disjoint dirs,
  * read-only audits of different artifacts, per-version check queries)
  * from a small thread pool lets the scheduler back-fill the tail of one
  * job with the next job's tasks — at any scale, this converts
  * sum-of-latencies into max-of-chains without touching a single plan.
  *
  * Semantics: results return in INPUT order (never completion order), so
  * callers assemble deterministic outputs; the first failure propagates
  * its ORIGINAL exception (same observable behavior as the sequential
  * loop it replaces); the pool is per-call and daemonized, so no state
  * outlives the call and a JVM exit is never held up.
  *
  * Spark-specific notes: concurrent actions on one SparkSession are a
  * supported, documented pattern (FIFO scheduling back-fills by default);
  * job groups/descriptions are thread-local, so concurrent jobs label
  * correctly in the UI. Callers are responsible for independence — no
  * thunk may write where another reads.
  */
private[graft] object Par {

  /** Jobs in flight. The guide's "2–3 is plenty" targets long compute
    * jobs on a shared cluster; these are sub-second metadata-heavy jobs
    * on an otherwise-idle driver, where the fixed per-job latency (plan,
    * codegen, schedule, commit) is the cost being hidden — a deeper pool
    * keeps the driver's planning thread and the executors busy at once.
    */
  private val DefaultParallelism = 8

  private val factory = new ThreadFactory {
    private val n = new java.util.concurrent.atomic.AtomicInteger
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
      t.setDaemon(true)
      t
    }
  }

  def run[A](thunks: Seq[() => A],
      parallelism: Int = DefaultParallelism): Seq[A] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(t => t())
    val pool = Executors.newFixedThreadPool(
      math.min(parallelism, thunks.size), factory)
    try {
      val fs = thunks.map(t => pool.submit(new Callable[A] {
        def call(): A = t()
      }))
      fs.map { f =>
        try f.get()
        catch { case e: ExecutionException => throw e.getCause }
      }
    } finally pool.shutdownNow()
  }

  /** Two-sided convenience: `par2(a, b)` for exactly two independent
    * actions (the dominant case in the kernels).
    */
  def run2[A, B](a: => A, b: => B): (A, B) = {
    val r = run[Any](Seq(() => a, () => b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}

package graft.core

import java.util.concurrent.{Callable, ExecutionException, Executors, ThreadFactory}

import org.apache.spark.sql.SparkSession

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
  * loop it replaces) and best-effort CANCELS the sibling thunks'
  * in-flight Spark jobs (each pool thread runs under a per-call job
  * group; the failure path cancels the group before rethrowing, so a
  * failed leg no longer leaves orphan sibling jobs writing to stores
  * while the caller unwinds — sibling thunks themselves still run to
  * their next action, which fails fast on the cancelled group). The pool
  * is per-call and daemonized, so no state outlives the call and a JVM
  * exit is never held up.
  *
  * Spark-specific notes: concurrent actions on one SparkSession are a
  * supported, documented pattern (FIFO scheduling back-fills by default);
  * job groups/descriptions are thread-local, so concurrent jobs label
  * correctly in the UI. Callers are responsible for independence — no
  * thunk may write where another reads.
  */
private[graft] object Par {

  /** Jobs in flight when [[ParallelismConf]] is unset. The guide's "2–3
    * is plenty" targets long compute jobs on a shared cluster; these are
    * sub-second metadata-heavy jobs on an otherwise-idle driver, where
    * the fixed per-job latency (plan, codegen, schedule, commit) is the
    * cost being hidden — a deeper pool keeps the driver's planning
    * thread and the executors busy at once.
    */
  private val DefaultParallelism = 8

  /** Session conf overriding the in-flight action count. On a SHARED
    * cluster set it to the guide's 2–3: eight concurrent actions from
    * one application would fight real workloads for executors there,
    * while the local default hides sub-second job latency on an
    * otherwise-idle box.
    */
  val ParallelismConf = "spark.graft.par.parallelism"

  private def configuredParallelism: Int =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption(ParallelismConf))
      .map(_.toInt)
      .getOrElse(DefaultParallelism)

  private val factory = new ThreadFactory {
    private val n = new java.util.concurrent.atomic.AtomicInteger
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
      t.setDaemon(true)
      t
    }
  }

  private val groupSeq = new java.util.concurrent.atomic.AtomicLong

  def run[A](thunks: Seq[() => A],
      parallelism: Int = -1): Seq[A] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(t => t())
    val width = if (parallelism > 0) parallelism else configuredParallelism
    val pool = Executors.newFixedThreadPool(
      math.min(width, thunks.size), factory)
    // one job group per call: the failure path cancels exactly this
    // call's in-flight sibling jobs, never an outer caller's (nested
    // Par calls get their own group — thread-local, set per pool thread)
    val session =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val group = s"graft-par-${groupSeq.incrementAndGet()}"
    try {
      val fs = thunks.map(t => pool.submit(new Callable[A] {
        def call(): A = {
          session.foreach(_.sparkContext
            .setJobGroup(group, group, interruptOnCancel = false))
          t()
        }
      }))
      fs.map { f =>
        try f.get()
        catch {
          case e: ExecutionException =>
            session.foreach(_.sparkContext.cancelJobGroup(group))
            throw e.getCause
        }
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

package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-entry job/stage/task profile — the measurement companion to
  * graft.Bench for THIS optimization pass. For each selected query it
  * reports wall seconds, Spark job count, stage count, task count, summed
  * task time, and shuffle read/write bytes. The interesting ratio is
  * task_time_sum / (wall * cores): entries far below 1.0 are
  * driver/scheduling/fixed-cost bound (many tiny jobs), not compute bound
  * — a different optimization lever (fewer actions, fewer commits, fewer
  * files) than a compute-bound entry (plan shape, codegen, shuffle bytes).
  *
  * Usage: SPARK_GRAFT_PROFILE_ONLY=a,b,c runMain graft.JobProfile [sfDir]
  */
object JobProfile {
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("graft-jobprofile",
        master = Some(s"local[$cpus]"), hiveSupport = false,
        shufflePartitions = Some(cpus.toInt),
        extraConfs = Map("spark.ui.enabled" -> "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val taskMs = new AtomicLong
    val shRead = new AtomicLong; val shWrite = new AtomicLong
    val inBytes = new AtomicLong
    val traceJobs = sys.env.contains("SPARK_GRAFT_PROFILE_TRACE")
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (traceJobs) {
          jobStartNs.put(j.jobId, System.nanoTime())
          val site = j.stageInfos.headOption.map { s =>
            val interesting = s.details.split('\n')
              .find(l => l.contains("graft.") && !l.contains("JobProfile"))
            s.name + " | " + interesting.getOrElse("").trim
          }.getOrElse("?")
          println(s"JOB ${j.jobId} START $site")
        }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (traceJobs) {
          val t0 = Option(jobStartNs.get(j.jobId)).getOrElse(0L)
          println(f"JOB ${j.jobId} END ${(System.nanoTime() - t0) / 1e9}%.3f")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        shRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        inBytes.addAndGet(s.stageInfo.taskMetrics.inputMetrics.bytesRead)
      }
    })
    val only = sys.env.get("SPARK_GRAFT_PROFILE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // one warm pass over q1 so session startup is not charged to the first entry
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    def settle(): Unit = Thread.sleep(400) // let the async listener bus drain
    println("name wall_s jobs stages tasks task_time_s busy_frac shuffle_mb input_mb")
    for (name <- names) {
      settle()
      val (j0, s0, t0, m0, r0, w0, i0) = (jobs.get, stages.get, tasks.get,
        taskMs.get, shRead.get, shWrite.get, inBytes.get)
      val start = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - start) / 1e9
        settle()
        val busy = (taskMs.get - m0) / 1e3
        println(s"PROF $name wall=${fmt(wall)} jobs=${jobs.get - j0} " +
          s"stages=${stages.get - s0} tasks=${tasks.get - t0} " +
          s"task_s=${fmt(busy)} busy_frac=${fmt(busy / (wall * cpus.toInt))} " +
          s"shuffle_mb=${fmt((shRead.get - r0 + shWrite.get - w0) / 2e6)} " +
          s"input_mb=${fmt((inBytes.get - i0) / 1e6)}")
      } catch {
        case e: Throwable => println(s"PROF $name FAILED ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}

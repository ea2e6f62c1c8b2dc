package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-query SHUFFLE/INPUT byte profile over the full query surface — the
  * measured half of every "only ids cross the shuffle" claim in PLANS.md.
  * Wall-clock medians (graft.Bench) say how fast a plan is on THIS box;
  * shuffle bytes say whether it survives a 1000× scale-up: an entry whose
  * shuffle is a small fraction of its input is network-light at 100 TB,
  * and an entry whose shuffle grows with the corpus is flagged here
  * before it becomes the bottleneck.
  *
  * Mechanics: a stage-completion listener accumulates executor-aggregated
  * shuffle read/write bytes; each query's delta is taken around its run
  * with a settle wait for the async listener bus, and the plan cache is
  * cleared per query so nothing serves from another entry's cached
  * subplan. Bytes are deterministic per plan+data (unlike timings), so
  * one pass suffices — the output is a committed evidence artifact
  * (`logs/shuffle_profile.json`), not a regression gate. Shuffle bytes
  * are COMPRESSED wire bytes (lz4) — exactly what the network moves.
  * Scan input bytes are deliberately NOT reported: on the local
  * filesystem the vectorized parquet reader bypasses the Hadoop FS
  * statistics this listener would see, so the number systematically
  * undercounts and would mislead.
  */
object ShuffleProfile {

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("graft-shuffle-profile",
        master = Some(s"local[$cpus]"), hiveSupport = false,
        shufflePartitions = Some(cpus.toInt),
        extraConfs = Map("spark.ui.enabled" -> "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shufRead = new AtomicLong(0)
    val shufWrite = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    // listener events are async; a settle wait before each snapshot keeps
    // a query's stages from bleeding into its neighbor's delta
    def settle(): Unit = Thread.sleep(300)
    def snap(): (Long, Long) = (shufRead.get(), shufWrite.get())

    for (warm <- Seq("q1_pricing_summary", "dedup_minhash_lsh"))
      try SparkEntry.queries(warm)(spark, sfDir).count()
      catch { case _: Throwable => () }

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val out = collection.mutable.LinkedHashMap.empty[String, String]
    for (name <- names) {
      // the CacheManager dedupes canonicalized plans ACROSS queries: a
      // subplan another entry (or the warmup) cached would serve this
      // one from memory and zero out its scan+shuffle — each query must
      // be profiled cold
      spark.catalog.clearCache()
      settle(); val (r0, w0) = snap()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        settle(); val (r1, w1) = snap()
        val mb = 1024.0 * 1024.0
        out(name) = s"""{"shuffle_read_mb":${fmt((r1 - r0) / mb)},""" +
          s""""shuffle_write_mb":${fmt((w1 - w0) / mb)}}"""
      } catch {
        case e: Throwable =>
          out(name) = s"""{"error":"${e.getClass.getSimpleName}"}"""
      }
    }
    val line = s"""{"metric":"shuffle_profile","unit":"mb","sf":"$sfDir",""" +
      s""""queries":${out.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")}}"""
    try {
      val p = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_SHUFFLE_OUT", "logs/shuffle_profile.json"))
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}

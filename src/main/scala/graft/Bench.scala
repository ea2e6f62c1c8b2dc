package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shared session contract (UTC, nanosAsLong, extensions, AQE…) — the
    // previous hand-built conf set here had already drifted (no UTC)
    val spark = graft.core.GraftSession.builder("graft-bench",
        master = Some(s"local[$cpus]"), hiveSupport = false,
        shufflePartitions = Some(cpus.toInt),
        extraConfs = Map("spark.ui.enabled" -> "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/file-index paths so the first timed query does
    // not absorb session startup; the minhash warmup covers the typed
    // flatMap + 128-column aggregate machinery the dedup family shares
    // (otherwise the alphabetically-first dedup query absorbs it all);
    // fixed ordering for run-to-run comparability
    // independent try per warmup: a q1 failure must not silently skip the
    // minhash warmup the dedup timings depend on
    for (warm <- Seq("q1_pricing_summary", "dedup_minhash_lsh"))
      try SparkEntry.queries(warm)(spark, sfDir).count()
      catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    spark.stop()
    // end-to-end 7-step workflow block (its own Hive-enabled session, built
    // after this one stops) — in the same JSON line so workflow regressions
    // are caught by the same per-round protocol as the query surface
    val workflow =
      try WorkflowBench.run(sfDir, cpus)
      catch { case e: Throwable =>
        s"""{"metric":"workflow_total","ok":false,"error":"${e.getClass.getSimpleName}"}"""
      }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""workflow":$workflow,"sf":"$sfDir"}""")
  }
}

package graft
import java.nio.file.{Files, Paths}

/** Plan-audit dump: `.explain("formatted")` text for every
  * SparkEntry.queries entry → one file per query under outDir. This is the
  * evidence behind PLANS.md — re-run it after touching any operator and
  * diff the output to see exactly what changed in the physical plans.
  *
  * Usage: runMain graft.Explain <sfDir> <outDir> [--no-aqe]
  * (--no-aqe disables adaptive execution so exchanges/joins are visible
  * statically instead of hiding inside AdaptiveSparkPlan leaves.)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val noAqe = args.contains("--no-aqe")
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (positional.length > 1) positional(1) else "target/explains"
    val spark = graft.core.GraftSession.builder("graft-explain",
        master = Some("local[4]"), hiveSupport = false,
        shufflePartitions = Some(4),
        extraConfs = Map("spark.ui.enabled" -> "false"))
      .getOrCreate()
    // runtime-settable override: the builder deliberately refuses to let
    // extraConfs override fixed confs, and AQE-off is a plan-probe need,
    // not a session contract change
    if (noAqe) spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"$name.txt"), txt)
      } catch { case e: Throwable =>
        failed += 1
        Files.writeString(Paths.get(outDir, s"$name.txt"), s"FAILED: ${e.getMessage}")
      }
    }
    println(s"wrote ${SparkEntry.queries.size} plan dumps to $outDir" +
      (if (failed > 0) s" ($failed FAILED)" else ""))
    if (failed > 0) sys.exit(1)
    spark.stop()
  }
}

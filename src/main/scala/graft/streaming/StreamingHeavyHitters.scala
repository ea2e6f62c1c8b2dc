package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** STREAMING heavy hitters — the micro-batch form of
  * [[graft.operators.HeavyHitters]], with the honest streaming contract:
  * counts are EXACT from the moment a key is tracked, and the occurrences
  * a key could have accumulated before tracking are carried as a provable
  * bound, not forgotten.
  *
  * Per batch: Misra–Gries per partition over the batch yields candidate
  * keys (every key with batch-partition count > n_p/k survives — the same
  * pigeonhole as the batch operator, now applied across batches too);
  * tracked = previously tracked ∪ new candidates; this batch's exact
  * per-key increments are added for tracked keys only. A key first
  * tracked at total-so-far `prevN` can have missed at most
  * `prevN / k` earlier occurrences: in every earlier batch it was NO
  * partition's candidate, so its count there was ≤ n_p/k — summing gives
  * the bound. [[report]] therefore emits `[min_count, max_count]` with
  * the true count provably inside, a `guaranteed` flag
  * (min_count·k > n — certainly heavy) and keeps any key that is still
  * POSSIBLY heavy (max_count·k > n).
  *
  * Exactly-once: state is rewritten per batch (bounded by tracked keys,
  * never batch or stream size) into a staged dir renamed to
  * `state_b<batchId>` — the [[graft.pipeline.Search.appendToIndex]]
  * journal discipline; a replayed micro-batch finds its committed dir and
  * no-ops. Restart reads the highest committed state. The batch operator
  * stays the oracle-gated form; this class's contract (bounds contain
  * the exact recount, replay no-op, restart-safe) is spec-pinned —
  * sketch internals have no SQL oracle, bounds do.
  */
object StreamingHeavyHitters {

  private val StateRe = "state_b(\\d+)".r

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedStates(spark: SparkSession, storeDir: String): Seq[(Long, String)] = {
    val f = fs(spark, storeDir)
    val root = new Path(storeDir)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq.flatMap(st => st.getPath.getName match {
      case StateRe(b) => Some((b.toLong, st.getPath.toString))
      case _ => None
    }).sortBy(_._1)
  }

  /** (total rows seen, state rows) of the latest committed state. */
  private def readState(spark: SparkSession, storeDir: String): (Long, Option[DataFrame]) =
    committedStates(spark, storeDir).lastOption match {
      case None => (0L, None)
      case Some((_, dir)) =>
        val f = fs(spark, storeDir)
        val in = f.open(new Path(s"$dir/_n"))
        val n = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
          finally in.close()
        (n, Some(spark.read.parquet(s"$dir/counts")))
    }

  /** Fold one micro-batch (any frame with a long `user_id` column) into
    * the store. Replay-safe per `batchId`.
    */
  def processBatch(batch: DataFrame, storeDir: String, batchId: Long,
      k: Int = 100): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val f = fs(spark, storeDir)
    f.mkdirs(new Path(storeDir))
    val committed = new Path(s"$storeDir/state_b$batchId")
    if (f.exists(committed)) return // replayed micro-batch: exactly-once
    val (prevN, prevState) = readState(spark, storeDir)
    val ids = batch.select(col("user_id").cast("long")).as[Long]
    val batchN = ids.count()
    val cands = ids.mapPartitions(it => HeavyHitters.misraGries(it, k))
      .distinct().toDF("user_id")
    val newKeys = prevState match {
      case Some(st) => cands.join(st.select("user_id"), Seq("user_id"), "left_anti")
      case None => cands
    }
    // a key first tracked NOW missed at most prevN/k earlier occurrences
    val newRows = newKeys
      .withColumn("cnt", lit(0L))
      .withColumn("max_miss", lit(prevN / k))
    val tracked = prevState.fold(newRows)(_.unionByName(newRows))
    val inc = ids.toDF("user_id").join(broadcast(
        tracked.select("user_id")), Seq("user_id"), "left_semi")
      .groupBy("user_id").agg(count(lit(1)).cast("long").as("inc"))
    val next = tracked.join(inc, Seq("user_id"), "left")
      .select(col("user_id"),
        (col("cnt") + coalesce(col("inc"), lit(0L))).as("cnt"),
        col("max_miss"))
    val staging = s"$storeDir/_staging_b$batchId"
    f.delete(new Path(staging), true)
    next.coalesce(1).write.parquet(s"$staging/counts")
    val out = f.create(new Path(s"$staging/_n"), true)
    try out.write((prevN + batchN).toString.getBytes("UTF-8")) finally out.close()
    require(f.rename(new Path(staging), committed),
      s"state commit lost a race for batch $batchId at $storeDir")
    // retire the previous state (the new dir carries the full state)
    committedStates(spark, storeDir).dropRight(1).foreach { case (_, d) =>
      f.delete(new Path(d), true)
    }
  }

  /** Keys still possibly heavy: true count ∈ [min_count, max_count],
    * `guaranteed` when even min_count clears n/k.
    */
  def report(spark: SparkSession, storeDir: String, k: Int = 100): DataFrame = {
    val (n, state) = readState(spark, storeDir)
    val st = state.getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long, Long)].toDF("user_id", "cnt", "max_miss")
    }
    st.select(col("user_id"), col("cnt").as("min_count"),
        (col("cnt") + col("max_miss")).as("max_count"))
      .withColumn("guaranteed", col("min_count") * k > n)
      .where(col("max_count") * k > n)
      .withColumn("total", lit(n))
      .orderBy("user_id")
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashes
import graft.sources.Tables

/** Deterministic training-order manifest — the artifact a trainer reads to
  * know exactly which data it feeds at global step N, byte-reproducible
  * across reruns and resumable mid-run:
  *
  *   1. mixture replication: each document appears `copies(source)` times
  *      ([[Sampling.epochsUpsample]] semantics — fractional weights via a
  *      deterministic hash cutoff);
  *   2. deterministic global shuffle: replicas are ordered by an affine
  *      hash of (doc_id, copy) — the "seeded shuffle" of a training run,
  *      reproducible in both engines, no RNG state anywhere;
  *   3. sequence packing in THAT order: a global exclusive prefix sum of
  *      token counts assigns each replica its stream offset, and
  *      `step = start_offset / capacity` is the training step whose batch
  *      window consumes the replica's first token.
  *
  * Resume-at-step-S is a filter, not a recompute: the rows with
  * `start_offset + n_tokens > S · capacity` are exactly the data still
  * owed to the run — no other engine state is needed, which is the point
  * of making the manifest a pure function of (corpus, weights, capacity).
  *
  * Daily data arrival is [[extendManifest]]: new documents join the stream
  * AFTER the current end (shuffled among themselves, offsets continuing
  * from the base total), so every already-published step keeps its data
  * byte-for-byte — the append-only contract consumed checkpoints depend
  * on. A global re-shuffle including the new data would be a new manifest
  * (a new training run), never an extension.
  *
  * Scale shape: replication is a map-only fan-out, the shuffle order is
  * one range exchange on the hash key, and the prefix sum is the
  * [[Packing]] two-phase pattern (per-partition totals → driver — ONE long
  * per partition — then a local running sum). Nothing corpus-sized is
  * collected and no single-partition window exists in the plan; at 100 TB
  * the manifest materializes as ordinary partitioned parquet and a trainer
  * reads only its steps' slice.
  */
object Manifest {

  /** Affine hash parameters for the shuffle order — its own stream, so
    * reordering the corpus is independent of sampling/split decisions
    * (which use [[Sampling.sampleHash]]'s stream).
    */
  private val (shufA, shufB) = Hashes.lcgParams(1, seed = 977L).head

  /** Multiplier folding the copy number into the shuffle key: two copies
    * of one document land far apart in the order (consecutive keys map to
    * distant hash values), and distinct (doc_id, copy) pairs stay distinct
    * mod [[Hashes.Prime]] for any corpus below Prime/131 documents per
    * copy band.
    */
  private val CopyFold = 131L

  private def shuffleKey(doc: Column, copy: Column): Column =
    Hashes.affine((doc * CopyFold + copy) % Hashes.Prime, shufA, shufB)

  private def shuffleKeySql(doc: String, copy: String): String =
    Hashes.affineSql(s"(($doc * $CopyFold + $copy) % ${Hashes.Prime})",
      shufA, shufB)

  /** Replicas of `docs` with shuffle key and token count:
    * (okey, doc_id, copy, source, n_tokens). The token count is computed
    * on the corpus row BEFORE the replica fan-out and rides through it
    * ([[Sampling.epochsUpsampleOf]] preserves input columns), so the
    * pipeline stays ONE corpus scan + map-only fan-out — no
    * replica-by-corpus re-join.
    */
  private def keyedReplicas(docs: DataFrame,
      epochs: Map[String, (Int, Int)], mod: Int): DataFrame = {
    val withTok = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Sampling.epochsUpsampleOf(withTok, epochs, mod)
      .select(shuffleKey(col("doc_id"), col("copy")).as("okey"),
        col("doc_id"), col("copy"), col("source"), col("n_tokens"))
  }

  /** Pack keyed replicas into the stream starting at `baseOffset` — the
    * [[Packing.withOffsets]] two-phase distributed prefix sum over the
    * shuffled order (range partition + per-partition totals to the driver
    * + local running sums; two uncached passes see identical partitioning
    * because the range sampler is deterministic for the same input and
    * the explicit count blocks AQE re-coalescing).
    */
  private def packedFrom(keyed: DataFrame, capacity: Int,
      baseOffset: Long): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val nRange = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = keyed
      .repartitionByRange(nRange, col("okey"), col("doc_id"), col("copy"))
      .sortWithinPartitions("okey", "doc_id", "copy")
      .as[(Long, Long, Long, String, Long)]
      .rdd
      .map { case (okey, id, copy, source, n) => ((okey, id, copy, source), n) }
    Packing.withOffsets(base, nRange, baseOffset)
      .map { case ((_, id, copy, source), n, start) =>
        (start / capacity, id, copy, source, n, start)
      }
      .toDF("step", "doc_id", "copy", "source", "n_tokens", "start_offset")
  }

  /** The manifest over any (doc_id, source, text) frame. */
  def trainManifestOf(docs: DataFrame,
      epochs: Map[String, (Int, Int)] = Sampling.DefaultEpochs,
      mod: Int = 100, capacity: Int = Packing.DefaultCapacity): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    packedFrom(keyedReplicas(docs, epochs, mod), capacity, 0L)
      .orderBy("start_offset")
  }

  /** The manifest: (step, doc_id, copy, source, n_tokens, start_offset)
    * in stream order. One row per mixture replica; `step` repeats while a
    * batch window fills and a replica spanning a window cut is split at
    * materialization time, exactly the [[Packing.packBins]] convention.
    */
  def trainManifest(spark: SparkSession, sfDir: String,
      epochs: Map[String, (Int, Int)] = Sampling.DefaultEpochs,
      mod: Int = 100, capacity: Int = Packing.DefaultCapacity): DataFrame =
    trainManifestOf(Tables.documents(spark, sfDir), epochs, mod, capacity)

  /** Extend a published manifest with newly arrived documents: the new
    * replicas are shuffled among themselves (same seeded order) and packed
    * starting at the next CAPACITY BOUNDARY after the base stream's end,
    * so every existing row — and every already-consumed step, including a
    * partially-filled final one the trainer padded out — survives
    * byte-for-byte. Sealing the seam step matters: packing new tokens
    * into the base's final window would put data into a step a resumed
    * run (filter `start_offset + n_tokens > S·capacity`) has already
    * passed, and it would silently never be trained on. One scalar
    * aggregate over the base (its total token count) is the only state
    * read from it.
    */
  def extendManifest(base: DataFrame, newDocs: DataFrame,
      epochs: Map[String, (Int, Int)] = Sampling.DefaultEpochs,
      mod: Int = 100, capacity: Int = Packing.DefaultCapacity): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val baseEnd = base
      .agg(coalesce(max(col("start_offset") + col("n_tokens")), lit(0L)))
      .collect().head.getLong(0)
    val seam = ((baseEnd + capacity - 1) / capacity) * capacity
    base.unionByName(
        packedFrom(keyedReplicas(newDocs, epochs, mod), capacity, seam))
      .orderBy("start_offset")
  }

  /** The oracle-gated extension entry: the corpus split into an "old"
    * slice (`doc_id % splitMod != 0`) whose manifest is built first, and a
    * "new" batch (`% splitMod == 0`) appended via [[extendManifest]] — the
    * daily-arrival shape with a deterministic split both engines derive.
    */
  def trainManifestExtend(spark: SparkSession, sfDir: String,
      splitMod: Long = 10L,
      epochs: Map[String, (Int, Int)] = Sampling.DefaultEpochs,
      mod: Int = 100, capacity: Int = Packing.DefaultCapacity): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val oldDocs = docs.where(col("doc_id") % splitMod =!= 0)
    val newDocs = docs.where(col("doc_id") % splitMod === 0)
    extendManifest(trainManifestOf(oldDocs, epochs, mod, capacity),
      newDocs, epochs, mod, capacity)
  }

  /** Shared oracle body: replicas keyed with the affine shuffle hash, an
    * optional block column splitting the stream into base (blk=0) and
    * extension (blk=1), per-block cumulative-sum offsets, the extension
    * block based at the capacity boundary after the base total — exactly
    * [[extendManifest]]'s sealed seam. For the plain manifest every row
    * is blk=0 and the seam term vanishes.
    */
  private def manifestSqlWith(blockExpr: String,
      epochs: Map[String, (Int, Int)], mod: Int, capacity: Int): String =
    s"""WITH reps AS (FROM (${Sampling.epochsUpsampleSql(epochs, mod)})),
       |toks AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
       |  FROM documents),
       |keyed AS (
       |  SELECT ${shuffleKeySql("r.doc_id", "r.copy")} AS okey,
       |    r.doc_id, r.copy, r.source, t.n_tokens,
       |    $blockExpr AS blk
       |  FROM reps r JOIN toks t USING (doc_id)),
       |base_total AS (
       |  SELECT CAST(coalesce(sum(n_tokens) FILTER (WHERE blk = 0), 0)
       |    AS BIGINT) AS t0
       |  FROM keyed),
       |c AS (
       |  SELECT keyed.*, CAST(coalesce(sum(n_tokens) OVER (
       |      PARTITION BY blk ORDER BY okey, doc_id, copy
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    + CASE WHEN blk = 0 THEN 0
       |           ELSE ((t0 + $capacity - 1) // $capacity) * $capacity END
       |    AS start_offset
       |  FROM keyed CROSS JOIN base_total)
       |SELECT start_offset // $capacity AS step, doc_id, copy, source,
       |  n_tokens, start_offset
       |FROM c ORDER BY start_offset""".stripMargin

  /** DuckDB oracle — replication ([[Sampling.epochsUpsampleSql]]'s sized
    * fan-out), the same affine shuffle key, and the stream offsets as a
    * plain cumulative-sum window; the hash gate proves the two-phase plan
    * equivalent.
    */
  def trainManifestSql(epochs: Map[String, (Int, Int)] = Sampling.DefaultEpochs,
      mod: Int = 100, capacity: Int = Packing.DefaultCapacity): String =
    manifestSqlWith("0", epochs, mod, capacity)

  /** DuckDB oracle for [[trainManifestExtend]] — build-then-extend stated
    * as ONE two-block ordering: old-corpus replicas first (in shuffle
    * order), new-batch replicas after (in shuffle order), one cumulative
    * sum across both. Equality with the Spark side proves the extension
    * starts exactly at the base end and keeps the base prefix intact.
    */
  def trainManifestExtendSql(splitMod: Long = 10L,
      epochs: Map[String, (Int, Int)] = Sampling.DefaultEpochs,
      mod: Int = 100, capacity: Int = Packing.DefaultCapacity): String =
    manifestSqlWith(s"CASE WHEN doc_id % $splitMod = 0 THEN 1 ELSE 0 END",
      epochs, mod, capacity)
}

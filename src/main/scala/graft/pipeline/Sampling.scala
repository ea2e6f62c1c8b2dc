package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashes
import graft.sources.Tables

/** Deterministic sampling for a training-data pipeline. `rand()` sampling
  * is non-reproducible (reruns, retried tasks, and added files all change
  * the sample); hashing a stable key gives a sample that is reproducible
  * run-to-run, stable under corpus growth (a doc's membership never
  * changes), and consistent across engines — which is what makes it
  * oracle-checkable at all.
  *
  * Two operators:
  *   - [[hashSample]]: keep rows whose key-hash lands under a rate cutoff.
  *     Pure map-side filter on the scan — zero shuffle, the 100 TB shape.
  *   - [[stratifiedSample]]: EXACT per-stratum quotas (ceil(frac·nₛ) rows
  *     per stratum, the hash-smallest ones). Exactness needs a per-stratum
  *     rank, but ranking a whole stratum in one window task dies at scale
  *     (few huge strata ⇒ one task per stratum). Instead: a two-phase
  *     boundary-bucket selection — (1) histogram rows into
  *     [[StratifiedBuckets]] order-aligned hash buckets per stratum (the
  *     aggregate is metadata-sized: strata × 4096, independent of corpus
  *     size) and derive each stratum's boundary bucket + remainder on the
  *     driver; (2) keep every row below the boundary bucket outright, and
  *     rank ONLY the boundary bucket's rows (~nₛ/4096 of the stratum) for
  *     the remainder. The oracle states the semantics as a plain
  *     row_number window; the hash gate proves the two-phase plan
  *     equivalent.
  */
object Sampling {

  /** Affine hash parameters for sampling (deterministic, engine-neutral). */
  private val (hashA, hashB) = Hashes.lcgParams(1, seed = 271L).head

  /** Sampling hash of a non-negative integer key: key is first reduced
    * mod Prime so the affine product stays in 64-bit range for ANY id
    * width (doc ids at 100 TB exceed 2^31; doc_id % Prime keeps the
    * arithmetic exact in both engines).
    */
  def sampleHash(key: Column): Column =
    Hashes.affine(key % Hashes.Prime, hashA, hashB)

  private def sampleHashSql(key: String): String =
    Hashes.affineSql(s"($key % ${Hashes.Prime})", hashA, hashB)

  /** JVM mirror of [[sampleHash]] — for driver-side reference
    * recomputations in specs (same affine arithmetic, same params).
    */
  def sampleHashJvm(key: Long): Long =
    Hashes.affineJvm(key % Hashes.Prime, hashA, hashB)

  /** Deterministic ~pct% sample of documents: keep rows with
    * hash % mod < pct. Map-only filter — no shuffle, no window, nothing
    * collected; membership is a pure function of doc_id.
    */
  def hashSample(spark: SparkSession, sfDir: String,
      pct: Int = 5, mod: Int = 100): DataFrame =
    Tables.documents(spark, sfDir)
      .where(sampleHash(col("doc_id")) % mod < pct)
      .select(col("doc_id"), col("lang"),
        (sampleHash(col("doc_id")) % mod).as("slot"))
      .orderBy("doc_id")

  def hashSampleSql(pct: Int = 5, mod: Int = 100): String =
    s"""SELECT doc_id, lang, ${sampleHashSql("doc_id")} % $mod AS slot
       |FROM documents
       |WHERE ${sampleHashSql("doc_id")} % $mod < $pct
       |ORDER BY doc_id""".stripMargin

  /** Order-aligned hash buckets for the stratified two-phase selection:
    * bucket = h DIV ceil(Prime/4096), so bucket order == hash order.
    */
  val StratifiedBuckets = 4096
  private val BucketWidth: Long =
    (Hashes.Prime + StratifiedBuckets - 1) / StratifiedBuckets

  /** Exact stratified sample: per stratum (lang), the ceil(frac·nₛ)
    * hash-smallest rows (total order (h, doc_id) — doc_id breaks hash
    * ties). See the object doc for the two-phase scale design.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String,
      frac: Double = 0.1): DataFrame =
    stratifiedSampleOf(Tables.documents(spark, sfDir), frac)

  /** [[stratifiedSample]] over any frame with (doc_id, lang) columns. */
  def stratifiedSampleOf(docs: DataFrame, frac: Double): DataFrame = {
    val spark = docs.sparkSession
    val base = docs.select(col("doc_id"), col("lang"))
      .withColumn("h", sampleHash(col("doc_id")))
      .withColumn("bkt", expr(s"h DIV $BucketWidth"))
    // Phase 1: per-(stratum, bucket) histogram — strata × 4096 rows, a
    // data-size-independent bound, so the collect is metadata-sized
    val hist = base.groupBy("lang", "bkt").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val boundaries = hist.groupBy(_._1).map { case (lang, rows) =>
      val total = rows.map(_._3).sum
      val quota = math.ceil(frac * total).toLong
      var cum = 0L; var bdry = -1L; var need = 0L
      rows.sortBy(_._2).foreach { case (_, bkt, c) =>
        if (bdry < 0) {
          if (cum + c >= quota) { bdry = bkt; need = quota - cum }
          cum += c
        }
      }
      (lang, bdry, need)
    }.toSeq
    import spark.implicits._
    val bdf = broadcast(boundaries.toDF("lang", "bdry", "need"))
    val withB = base.join(bdf, "lang")
    val below = withB.where(col("bkt") < col("bdry"))
    // Phase 2: rank only the boundary bucket's rows (~nₛ/4096 per stratum)
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val atBoundary = withB.where(col("bkt") === col("bdry"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("need"))
      .drop("rk")
    below.unionByName(atBoundary)
      .select(col("doc_id"), col("lang"), col("h"))
      .orderBy("doc_id")
  }

  /** source→int lookup as an inline when-chain (with its SQL mirror) — the
    * single definition behind every per-source rate/weight resolution.
    * Entries fold in sorted-key order so the Column tree and the SQL CASE
    * sequence conditions identically (map iteration order must never leak
    * into a query contract).
    */
  private def caseChain(key: Column, m: Map[String, Int], default: Int): Column =
    m.toSeq.sortBy(_._1).foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(key === k, v).otherwise(acc)
    }

  private def caseChainSql(keyExpr: String, m: Map[String, Int], default: Int): String = {
    val cases = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN $keyExpr = '$k' THEN $v" }.mkString(" ")
    s"CASE $cases ELSE $default END"
  }

  /** Default mixture: upweight low-index (curated) sources, taper the
    * long tail — src0 keeps 100%, each subsequent source 5 points less,
    * floored at 10%. A real pipeline passes its tuned weights; the shape
    * (few curated sources near 1.0, web tail well below) is the standard
    * training-mixture pattern.
    */
  val DefaultMixture: Map[String, Int] =
    (0 until 20).map(i => s"src$i" -> math.max(10, 100 - 5 * i)).toMap

  /** Per-source mixture sampling: keep a source-dependent deterministic
    * fraction of each source (domain up/down-weighting for a training
    * mix). Same hash-cutoff scheme as [[hashSample]], so it is map-only —
    * the per-source rate is a `CASE` on the source column resolved inline
    * during the scan; NO join, NO shuffle, nothing corpus-sized anywhere
    * (the rate table is query-literal-sized). Sources absent from `rates`
    * are dropped (rate 0) — the conservative default for an unlisted
    * domain in a curated mix.
    */
  def mixtureSample(spark: SparkSession, sfDir: String,
      rates: Map[String, Int] = DefaultMixture, mod: Int = 100): DataFrame = {
    val rate = caseChain(col("source"), rates, default = 0)
    Tables.documents(spark, sfDir)
      .where(sampleHash(col("doc_id")) % mod < rate)
      .select(col("doc_id"), col("source"),
        (sampleHash(col("doc_id")) % mod).as("slot"))
      .orderBy("doc_id")
  }

  def mixtureSampleSql(rates: Map[String, Int] = DefaultMixture,
      mod: Int = 100): String =
    s"""SELECT doc_id, source, ${sampleHashSql("doc_id")} % $mod AS slot
       |FROM documents
       |WHERE ${sampleHashSql("doc_id")} % $mod < ${caseChainSql("source", rates, 0)}
       |ORDER BY doc_id""".stripMargin

  /** Deterministic train/val/test split: the hash slot that drives
    * [[hashSample]] also assigns the split (slot < 90 → train, < 95 → val,
    * else test), so membership is a pure function of doc_id — reproducible
    * across reruns, stable under corpus growth, and every doc lands in
    * exactly one split (the property `rand()` splits silently lose when a
    * task retries). Reported as per-(source, split) counts; the labeling
    * itself is a map-only scan expression, the aggregate shuffles one
    * counter row per (source, split) after map-side combine.
    */
  def sampleSplit(spark: SparkSession, sfDir: String,
      trainPct: Int = 90, valPct: Int = 5, mod: Int = 100): DataFrame = {
    val slot = sampleHash(col("doc_id")) % mod
    Tables.documents(spark, sfDir)
      .withColumn("split",
        when(slot < trainPct, "train")
          .when(slot < trainPct + valPct, "val")
          .otherwise("test"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy("source", "split")
  }

  def sampleSplitSql(trainPct: Int = 90, valPct: Int = 5, mod: Int = 100): String =
    s"""WITH labeled AS (
       |  SELECT source, n_chars,
       |    CASE WHEN ${sampleHashSql("doc_id")} % $mod < $trainPct THEN 'train'
       |         WHEN ${sampleHashSql("doc_id")} % $mod < ${trainPct + valPct} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents)
       |SELECT source, split, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS n_chars
       |FROM labeled GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  /** Fractional per-source epoch weights for upsampling: curated sources
    * repeat >1× per training run (the standard mixture trick — weight 2.5
    * means every doc appears twice and half the docs a third time).
    */
  val DefaultEpochs: Map[String, (Int, Int)] = Map(
    // source -> (full copies, extra-copy percentage)
    "src0" -> (2, 50), "src1" -> (2, 0), "src2" -> (1, 50))

  /** Materialize the upsampled training view: each doc of a weighted
    * source appears `full` times, plus one more copy when its hash slot
    * lands under `extraPct` (so a 2.5 weight is exact in expectation AND
    * deterministic per doc); unlisted sources keep weight 1. Map-only:
    * the copy fan-out is an inline `explode(sequence(...))` on the scan —
    * membership and multiplicity are pure functions of (doc_id, source),
    * nothing shuffles, and the op composes with the split/mixture filters.
    */
  def epochsUpsample(spark: SparkSession, sfDir: String,
      epochs: Map[String, (Int, Int)] = DefaultEpochs, mod: Int = 100): DataFrame =
    epochsUpsampleOf(
        Tables.documents(spark, sfDir).select("doc_id", "source"), epochs, mod)
      .orderBy("doc_id", "copy")

  /** [[epochsUpsample]] over any frame with (doc_id, source) columns —
    * EVERY input column is preserved on the replicas (plus `copy`), and
    * the presentation sort is left to the caller. The composition form:
    * [[Manifest]] replicates (doc_id, source, n_tokens) rows through it
    * so token counts ride the map-only fan-out instead of re-joining the
    * corpus afterwards.
    */
  def epochsUpsampleOf(docs: DataFrame,
      epochs: Map[String, (Int, Int)] = DefaultEpochs, mod: Int = 100): DataFrame = {
    val full = caseChain(col("source"), epochs.map { case (k, v) => k -> v._1 },
      default = 1)
    val extraPct = caseChain(col("source"), epochs.map { case (k, v) => k -> v._2 },
      default = 0)
    val copies = full + when(sampleHash(col("doc_id")) % mod < extraPct, 1).otherwise(0)
    docs
      .withColumn("n_copies", copies.cast("long"))
      // a zero-copy doc must be DROPPED: Spark's sequence(1, 0) infers
      // step -1 and yields [1, 0] (two rows!) where DuckDB's
      // generate_series(1, 0) is empty — filter before the explode
      .where(col("n_copies") >= 1)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
      .drop("n_copies")
  }

  def epochsUpsampleSql(epochs: Map[String, (Int, Int)] = DefaultEpochs,
      mod: Int = 100): String = {
    val fullSql = caseChainSql("source", epochs.map { case (k, v) => k -> v._1 }, 1)
    val pctSql = caseChainSql("source", epochs.map { case (k, v) => k -> v._2 }, 0)
    s"""WITH sized AS (
       |  SELECT doc_id, source,
       |    ($fullSql) +
       |    (CASE WHEN ${sampleHashSql("doc_id")} % $mod < ($pctSql)
       |          THEN 1 ELSE 0 END) AS n_copies
       |  FROM documents)
       |SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS copy
       |FROM sized ORDER BY doc_id, copy""".stripMargin
  }

  /** DuckDB oracle — the SEMANTICS of [[stratifiedSample]] (per-stratum
    * rank over (h, doc_id), quota ceil(frac·nₛ)) in its simplest form.
    */
  def stratifiedSampleSql(frac: Double = 0.1): String =
    s"""WITH h AS (
       |  SELECT doc_id, lang, ${sampleHashSql("doc_id")} AS h FROM documents),
       |n AS (SELECT lang, count(*) AS n FROM h GROUP BY 1),
       |r AS (SELECT h.*, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
       |      FROM h)
       |SELECT doc_id, lang, h
       |FROM r JOIN n USING (lang)
       |WHERE rk <= CAST(ceil(n * $frac) AS BIGINT)
       |ORDER BY doc_id""".stripMargin
}

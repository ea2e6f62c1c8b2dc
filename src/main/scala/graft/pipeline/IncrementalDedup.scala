package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashes
import graft.sources.Tables

/** Incremental (corpus-vs-batch) near-dup detection — the shape a
  * production ingestion pipeline runs every day: the accumulated corpus's
  * MinHash state is PERSISTED once (signature + band-bucket parquet
  * store), and each new document batch is signed, banded, and probed
  * against the store. The corpus side is never recomputed from raw
  * documents — a probe reads only the store.
  *
  * Store layout under `storeDir`:
  *   - `signatures/` — (doc_id, sig ARRAY<BIGINT>[128]): the full MinHash
  *     signatures, read only by the per-candidate verify join.
  *   - `buckets/`    — (doc_id, band, bucket): the LSH band buckets, the
  *     ONLY table the candidate join touches — 3 small columns, so the
  *     probe scan never pays the 128-long array's I/O.
  *
  * Scale shape of a probe: the batch is scanned once (signatures are a
  * pure typed-map function of each doc — no shuffle), staged to parquet,
  * and every subsequent join is parquet-vs-parquet: candidates shuffle
  * (band, bucket) id-pairs only, O(batch×bands + matched-corpus-rows),
  * never O(corpus). Verify re-joins the two signature tables per
  * candidate. Appending a day's accepted docs is a parquet append of
  * exactly their signature/bucket rows.
  *
  * Same arithmetic contract as [[Dedup.minHashSignatures]] /
  * [[Dedup.minHashLshSql]] (shared shingle definition, LCG-derived affine
  * permutations, band fold), so the whole incremental flow carries a full
  * value-level DuckDB oracle.
  */
object IncrementalDedup {

  def signaturesPath(storeDir: String): String = s"$storeDir/signatures"
  def bucketsPath(storeDir: String): String = s"$storeDir/buckets"

  /** DEFAULT doc-shard fan-out ([[AnnIndex.VecShards]] discipline): BOTH
    * store tables are doc-keyed, so hive-partitioning them by
    * `shard = pmod(doc_id, docShards)` makes a takedown's affected leaves
    * a pure function of its id list — [[deleteFromStore]] rewrites only
    * those, with NO scan to find them. The fan-out is a store-creation
    * parameter ([[StoreParams]]); legacy stores keep this default.
    */
  val DocShards = 32

  private[graft] def docShardsOf(spark: SparkSession,
      storeDir: String): Int =
    StoreParams.int(spark, storeDir, "docShards", DocShards)

  private def withDocShard(df: DataFrame, n: Int): DataFrame =
    df.withColumn("shard", pmod(col("doc_id"), lit(n.toLong)).cast("int"))

  /** Build (overwrite) the persisted MinHash store from a corpus frame.
    * One scan of the corpus computes the signatures; the bucket table is
    * derived from the WRITTEN signatures so the corpus is not re-scanned.
    */
  def buildStore(docs: DataFrame, storeDir: String,
      docShards: Int = DocShards): Unit = {
    val spark = docs.sparkSession
    require(docShards > 0, s"shard fan-out must be positive: $docShards")
    StoreParams.write(spark, storeDir, Map("docShards" -> docShards))
    withDocShard(Dedup.minHashSignatures(docs), docShards)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(signaturesPath(storeDir))
    withDocShard(Dedup.bandedOf(spark.read.parquet(signaturesPath(storeDir))
        .select("doc_id", "sig")), docShards)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(bucketsPath(storeDir))
  }

  /** Append a batch's signature/bucket rows to the store — the daily
    * accept step after probing. The docs frame is scanned once to compute
    * signatures into `append_staging/`; both store appends then read only
    * that staged O(batch) parquet — the corpus-sized signature store is
    * never scanned (re-deriving buckets by filtering the store would make
    * every daily append O(corpus) I/O).
    */
  def appendToStore(docs: DataFrame, storeDir: String): Unit = {
    val spark = docs.sparkSession
    val stagingDir = s"$storeDir/append_staging"
    Dedup.minHashSignatures(docs).write.mode("overwrite").parquet(stagingDir)
    val staged = spark.read.parquet(stagingDir)
    val n = docShardsOf(spark, storeDir)
    // both appends read only the staged O(batch) parquet and write
    // disjoint store tables — overlapped (guide §2.6)
    graft.core.Par.run2(
      withDocShard(staged, n)
        .write.mode("append").partitionBy("shard")
        .parquet(signaturesPath(storeDir)),
      withDocShard(Dedup.bandedOf(staged), n)
        .write.mode("append").partitionBy("shard")
        .parquet(bucketsPath(storeDir)))
    ()
  }

  /** Delete documents from the persisted MinHash store by id — the
    * takedown path. No trained parameters and no global statistics live
    * here, so delete ≡ rebuild over the survivors exactly; both tables'
    * affected `shard=pmod(id, DocShards)` leaves are named directly by
    * the id list and rewritten via the staged-retire-install renames of
    * [[AnnIndex.rewriteShardLeaves]] (idempotent, crash-heal). After the
    * delete a probe can no longer surface the documents as near-dup
    * matches — the GDPR contract for a store whose signatures are
    * themselves derived personal data.
    */
  def deleteFromStore(spark: SparkSession, storeDir: String,
      ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    val n = docShardsOf(spark, storeDir).toLong
    val shards = ids
      .map(i => java.lang.Math.floorMod(i, n).toInt).distinct
    // disjoint store tables, idempotent staged-retire-install rewrites —
    // overlapped (guide §2.6)
    graft.core.Par.run2(
      AnnIndex.rewriteShardLeaves(spark, signaturesPath(storeDir), shards,
        "doc_id", ids),
      AnnIndex.rewriteShardLeaves(spark, bucketsPath(storeDir), shards,
        "doc_id", ids))
    ()
  }

  /** Probe a new batch against the store: emit (new_doc_id,
    * corpus_doc_id, est_jaccard) for every store document whose estimated
    * Jaccard with a batch document clears `threshold`.
    *
    * The batch's signatures are computed ONCE (typed map, no shuffle) and
    * staged to `batch_staging/` under the store (nothing ever lists the
    * store root, so the staging dir cannot leak into a store read; an
    * underscore prefix would instead make Spark's file index silently
    * ignore the staged files); the returned plan then reads parquet
    * only — no scan of raw documents, corpus or batch, survives in it
    * (the plan spec pins this).
    */
  def probeStore(spark: SparkSession, storeDir: String, batch: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    val stagingDir = s"$storeDir/batch_staging"
    Dedup.minHashSignatures(batch).write.mode("overwrite").parquet(stagingDir)
    val newSig = spark.read.parquet(stagingDir)
    val cand = Dedup.bandedOf(newSig).as("n")
      .join(spark.read.parquet(bucketsPath(storeDir)).as("c"),
        col("n.band") === col("c.band") && col("n.bucket") === col("c.bucket") &&
          // a batch doc must never match ITSELF in the store — without this
          // guard a replayed micro-batch (crash between store append and
          // stream commit) would quarantine its own accepted docs as
          // self-duplicates at jaccard 1.0
          col("n.doc_id") =!= col("c.doc_id"))
      .select(col("n.doc_id").as("new_doc_id"), col("c.doc_id").as("corpus_doc_id"))
      .dropDuplicates("new_doc_id", "corpus_doc_id")
    cand
      .join(newSig.select(col("doc_id").as("new_doc_id"), col("sig").as("sig_n")),
        "new_doc_id")
      .join(spark.read.parquet(signaturesPath(storeDir))
          .select(col("doc_id").as("corpus_doc_id"), col("sig").as("sig_c")),
        "corpus_doc_id")
      .withColumn("est_jaccard", round(
        call_function("graft_eqcount", col("sig_n"), col("sig_c"))
          .cast("double") / Dedup.NumPerms, 4))
      .where(col("est_jaccard") >= threshold)
      .select("new_doc_id", "corpus_doc_id", "est_jaccard")
  }

  /** Intra-batch near-dup pairs over an already-staged (doc_id, sig)
    * signature frame — the complement of [[probeStore]], which is blind to
    * two duplicates arriving in the SAME batch. Bands the staged
    * signatures against themselves; of each pair the LOWER id is reported
    * as the canonical `corpus_doc_id` and the higher as the quarantined
    * `new_doc_id`, so the output unions cleanly with a store probe's.
    */
  def selfProbe(staged: DataFrame, threshold: Double = 0.7): DataFrame = {
    val banded = Dedup.bandedOf(staged)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("corpus_doc_id"), col("b.doc_id").as("new_doc_id"))
      .dropDuplicates("new_doc_id", "corpus_doc_id")
      .join(staged.select(col("doc_id").as("new_doc_id"), col("sig").as("sig_n")),
        "new_doc_id")
      .join(staged.select(col("doc_id").as("corpus_doc_id"), col("sig").as("sig_c")),
        "corpus_doc_id")
      .withColumn("est_jaccard", round(
        call_function("graft_eqcount", col("sig_n"), col("sig_c"))
          .cast("double") / Dedup.NumPerms, 4))
      .where(col("est_jaccard") >= threshold)
      .select("new_doc_id", "corpus_doc_id", "est_jaccard")
  }

  /** Surface query: split `documents` 80/20 into corpus (doc_id % 5 <> 0)
    * and today's batch (doc_id % 5 = 0), build the store from the corpus,
    * probe the batch. Store lives in a fresh temp dir per run — building
    * it IS part of the measured operation.
    */
  def dedupIncremental(spark: SparkSession, sfDir: String,
      threshold: Double = 0.7): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val storeDir = Stores.temp("graft-incr-store")
    buildStore(docs.where(col("doc_id") % 5 =!= 0), storeDir)
    probeStore(spark, storeDir, docs.where(col("doc_id") % 5 === 0), threshold)
      .orderBy("new_doc_id", "corpus_doc_id")
  }

  /** Surface query for [[deleteFromStore]]: build the corpus store, take
    * down every `doc_id % 7 = 1` corpus document, probe today's batch.
    * The deleted slice contains matched corpus ids at every sf (verified
    * against the undeleted entry's output), so rows disappear — the probe
    * provably cannot surface a taken-down document.
    */
  def dedupIncrementalDelete(spark: SparkSession, sfDir: String,
      threshold: Double = 0.7): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val storeDir = Stores.temp("graft-incr-del")
    // id collect reads only the base table — overlaps the build
    val (_, ids) = graft.core.Par.run2(
      buildStore(docs.where(col("doc_id") % 5 =!= 0), storeDir),
      docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 1)
        .select("doc_id").collect().map(_.getLong(0)).toSeq)
    deleteFromStore(spark, storeDir, ids)
    probeStore(spark, storeDir, docs.where(col("doc_id") % 5 === 0), threshold)
      .orderBy("new_doc_id", "corpus_doc_id")
  }

  /** DuckDB oracle — the same 128 affine mins, band fold, and estimate as
    * [[Dedup.minHashLshSql]], with the candidate join split corpus-vs-
    * batch by the same doc_id % 5 rule. `corpusDeleteWhere` mirrors
    * [[deleteFromStore]]: a deleted corpus doc vanishes from both store
    * tables, which for a parameter-free store is exactly a corpus-side
    * filter (delete ≡ rebuild over survivors).
    */
  def dedupIncrementalSql(threshold: Double = 0.7,
      corpusDeleteWhere: Option[String] = None): String = {
    val corpusDel = corpusDeleteWhere.map(p => s" AND NOT ($p)").getOrElse("")
    val minCols = Dedup.permParams.zipWithIndex.map { case ((a, b), i) =>
      s"min(${Hashes.affineSql("h", a, b)}) AS mh_$i"
    }.mkString(",\n    ")
    val sigList = (0 until Dedup.NumPerms).map(i => s"mh_$i").mkString("[", ", ", "]")
    s"""WITH ${Dedup.shingleCtes},
       |hs AS (SELECT doc_id, ${Hashes.polyHashSql("shingle")} AS h FROM sh),
       |sig AS (SELECT doc_id,
       |    $minCols
       |  FROM hs GROUP BY doc_id),
       |sa AS (SELECT doc_id, $sigList AS sig FROM sig),
       |banded AS (
       |  SELECT doc_id, band,
       |    ${Hashes.foldBucketSql("sig[band*8+1 : band*8+8]")} AS bucket
       |  FROM sa CROSS JOIN (SELECT unnest(generate_series(0, ${Dedup.NumBands - 1})) AS band) bands),
       |cand AS (
       |  SELECT DISTINCT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
       |  FROM banded n JOIN banded c
       |    ON n.band = c.band AND n.bucket = c.bucket
       |  WHERE n.doc_id % 5 = 0 AND c.doc_id % 5 <> 0$corpusDel),
       |est AS (
       |  SELECT new_doc_id, corpus_doc_id,
       |    round(list_sum(list_transform(generate_series(1, ${Dedup.NumPerms}),
       |      i -> CASE WHEN x.sig[i] = y.sig[i] THEN 1 ELSE 0 END)) / ${Dedup.NumPerms}.0, 4) AS est_jaccard
       |  FROM cand JOIN sa x ON cand.new_doc_id = x.doc_id
       |            JOIN sa y ON cand.corpus_doc_id = y.doc_id)
       |SELECT new_doc_id, corpus_doc_id, est_jaccard FROM est
       |WHERE est_jaccard >= $threshold ORDER BY new_doc_id, corpus_doc_id""".stripMargin
  }
}

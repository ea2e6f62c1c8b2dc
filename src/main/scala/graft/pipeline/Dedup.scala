package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication operators for a training-data pipeline, smallest-to-
  * largest hammer: exact (hash groupBy), n-gram Jaccard (shingle
  * self-join), MinHash+LSH (band-bucketed candidates), SimHash (hamming
  * banding), embedding cosine (see [[Similarity]] for the ANN side).
  *
  * Scale design:
  *   - exact dedup: one shuffle on the content hash, map-side combine.
  *   - n-gram Jaccard is quadratic in docs *sharing a shingle* — at 100 TB
  *     you never run it globally; it is the verification stage AFTER a
  *     candidate generator (LSH below). It is exposed standalone because
  *     the reference-scale corpus allows it and the oracle can check it.
  *   - MinHash: signatures computed in ONE aggregation over exploded
  *     shingle hashes (128 permutations as 128 partial-agg min columns —
  *     no |shingles|×|perms| row blowup); LSH bands hash 8 rows each so
  *     candidate generation is an equi-join on (band, bucket): shuffle is
  *     O(docs×bands), independent of pair count.
  *   - SimHash: 64-bit fingerprint from token-hash bit votes; near-dup
  *     candidates via 8-bit band equality (hamming ≤ k ⇒ some band equal).
  */
object Dedup {

  private val tokens = split(col("text"), " ")

  /** Token 3-gram shingles (distinct), as used by both Jaccard and MinHash. */
  private val shingles: Column = expr(
    """CASE WHEN size(split(text, ' ')) >= 3
      |THEN array_distinct(transform(sequence(0, size(split(text, ' ')) - 3),
      |       i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2])))
      |ELSE array_distinct(array(text)) END""".stripMargin)

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group by content hash, keep the lowest doc_id. Output is
    * the keeper per group with its duplicate count.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  val exactSql: String =
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Bag-of-words dedup: same, keyed on the order-insensitive fingerprint —
    * catches token-reordered copies exact dedup misses.
    */
  def bagOfWords(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(concat_ws(" ", array_sort(array_distinct(tokens))).cast("binary")).as("bag_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .where(col("n_docs") > 1)
      .orderBy("keep_id")

  val bagOfWordsSql: String =
    """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_hash,
      |  min(doc_id) AS keep_id, count(*) AS n_docs
      |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY keep_id""".stripMargin

  // ------------------------------------------------------- n-gram Jaccard

  /** Near-dup pairs by exact Jaccard over token 3-gram shingles,
    * threshold 0.8. Shuffles: explode→(shingle) join, then pair groupBy.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(shingles).as("shingle"))
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val common = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(counts.as("ca"), col("id_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("id_b") === col("cb.doc_id"))
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (col("ca.n") + col("cb.n") - col("common")), 4))
      .where(col("jaccard") >= 0.8)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  val ngramJaccardSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |         THEN list_distinct(list_transform(generate_series(1, len(t)-2),
      |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |         ELSE list_distinct([array_to_string(t, ' ')]) END) AS shingle
      |       FROM toks),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |common AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(common * 1.0 / (ca.n + cb.n - common), 4) AS jaccard
      |FROM common
      |JOIN cnt ca ON id_a = ca.doc_id
      |JOIN cnt cb ON id_b = cb.doc_id
      |WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------- MinHash LSH

  val NumPerms = 128
  val NumBands = 16 // 8 rows per band
  private val MersennePrime = 2147483647L // 2^31-1

  /** Deterministic permutation parameters (derived from a fixed LCG so the
    * operator is reproducible run-to-run).
    */
  private val permParams: Seq[(Long, Long)] = {
    var state = 42L
    def next(): Long = { state = (state * 6364136223846793005L + 1442695040888963407L); (state >>> 33) }
    Seq.fill(NumPerms)((next() % (MersennePrime - 1) + 1, next() % MersennePrime))
  }

  /** MinHash signatures: one row per doc with 128 minhash columns computed
    * as partial-aggregated mins over exploded shingle hashes.
    */
  def minHashSignatures(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"), explode(shingles).as("shingle"))
      .withColumn("h", abs(hash(col("shingle")).cast("long")))
    val mins = permParams.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MersennePrime).as(s"mh_$i")
    }
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: equal (band, band-hash) buckets; then verified by
    * estimated Jaccard = fraction of equal minhash components ≥ threshold.
    */
  def minHashLsh(spark: SparkSession, sfDir: String, threshold: Double = 0.7): DataFrame = {
    val sigs = minHashSignatures(Tables.documents(spark, sfDir))
    val sigArr = sigs.withColumn("sig", array((0 until NumPerms).map(i => col(s"mh_$i")): _*))
      .select("doc_id", "sig")
    val banded = sigArr.select(
      col("doc_id"), col("sig"),
      explode(array((0 until NumBands).map { bnd =>
        struct(lit(bnd).as("band"), hash(slice(col("sig"), bnd * 8 + 1, 8)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("est_jaccard", round(
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          v => v === 1)).cast("double") / NumPerms, 4))
      .where(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
      .orderBy("id_a", "id_b")
  }

  // ------------------------------------------------------------- SimHash

  val SimHashBits = 64

  /** 64-bit SimHash fingerprints: per-token hash bit votes, sign-aggregated
    * in one groupBy (64 partial-agg sum columns), bits recombined.
    */
  def simHashFingerprints(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(array_distinct(tokens)).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val votes = (0 until SimHashBits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v_$i")
    }
    val agg = tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val fp = (0 until SimHashBits).map { i =>
      when(col(s"v_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup candidates: 8×8-bit bands; pairs agreeing on ≥1 band
    * are verified by exact hamming distance ≤ maxHamming.
    */
  def simHashPairs(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    val fps = simHashFingerprints(Tables.documents(spark, sfDir))
    val banded = fps.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until 8).map { bnd =>
        struct(lit(bnd).as("band"),
          shiftright(col("simhash"), bnd * 8).bitwiseAND(0xFF).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bucket"))
    val a = banded.as("a"); val b = banded.as("b")
    val hamming = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming.as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  // -------------------------------------------------- embedding near-dup

  /** Embedding near-dup pairs: cosine ≥ threshold over the brute-force
    * pair space (the oracle-checkable baseline; the LSH-bucketed scale
    * path is [[Similarity.cosineLshPairs]]).
    */
  def embeddingCosine(spark: SparkSession, sfDir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val a = e.as("a"); val b = e.as("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", Similarity.cosine(col("a.v"), col("b.v")))
      .where(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("id_a", "id_b")
  }

  val embeddingCosineSql: String =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin
}

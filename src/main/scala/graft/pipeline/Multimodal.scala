package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decode/feature-extract/frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * a clearly-marked deterministic fake ([[StubCodec]]). Everything around
  * it is real and tested: the asset schema, the batched per-partition
  * processing shape (the Scala analogue of `mapInPandas` — one iterator
  * pass, no per-row JVM↔codec churn), partitioning behavior, and the
  * feature/frame schemas.
  *
  * At 100 TB: assets are processed partition-by-partition with constant
  * memory (iterator in, iterator out), never collected; frame sampling
  * multiplies rows deterministically so downstream repartitioning can plan
  * on exact cardinalities.
  */
object Multimodal {

  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false)))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("fingerprint", LongType, nullable = false)))

  /** STUB codec: stands in for a real image/audio decoder (not available
    * in this container). Deterministic pure function of the bytes so tests
    * and the oracle can pin its outputs. Swap for a real codec by
    * replacing these three functions only.
    */
  object StubCodec {
    def width(bytes: Array[Byte]): Int = 64 + math.floorMod(bytes.length, 577)
    def height(bytes: Array[Byte]): Int = 64 + math.floorMod(bytes.length * 31, 419)
    def fingerprint(bytes: Array[Byte]): Long = {
      // FNV-1a 64-bit over the raw bytes — a stand-in for a perceptual hash
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }
  }

  /** Build a binary asset table from `documents` (text bytes as the opaque
    * media payload — the shape is what matters; real corpora put
    * jpeg/wav/mp4 bytes here).
    */
  def assets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("media"),
      concat(lit("fake/"), element_at(array(lit("jpeg"), lit("png"), lit("webp")),
        (col("doc_id") % 3 + 1).cast("int"))).as("media_type"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"))

  /** Batched per-partition feature extraction through the stub codec —
    * the `mapInPandas`-shaped stage: iterator-in/iterator-out, constant
    * memory, no driver involvement.
    */
  def extractFeatures(spark: SparkSession, assetsDf: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(FeatureSchema)
    assetsDf.select("asset_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, StubCodec.width(bytes), StubCodec.height(bytes), 3,
          StubCodec.fingerprint(bytes))
      }
    }(enc)
  }

  /** Deterministic frame sampling: one output row per sampled frame index
    * (every `stride`-th frame of a fake duration derived from byte_len).
    * Pure column expressions — the explode multiplies rows without
    * shuffling.
    */
  def frameSample(assetsDf: DataFrame, stride: Int = 10): DataFrame =
    assetsDf
      .withColumn("n_frames", (col("byte_len") % 97 + 1).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("asset_id"), col("n_frames"), col("frame_idx"))

  /** SQL-checkable surface: asset metadata + stub-decoded dimensions
    * expressed as pure column arithmetic (the oracle mirrors the stub's
    * arithmetic; the fingerprint goes through the real mapPartitions path
    * and is covered by ScalaTest instead).
    */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    assets(spark, sfDir).select(
      col("asset_id"), col("media_type"), col("byte_len"),
      (lit(64) + pmod(col("byte_len"), lit(577))).cast("int").as("width"),
      (lit(64) + pmod(col("byte_len") * 31, lit(419))).cast("int").as("height"))
      .orderBy("asset_id")

  val featuresSql: String =
    """SELECT doc_id AS asset_id,
      |  'fake/' || ['jpeg', 'png', 'webp'][(doc_id % 3 + 1)::INT] AS media_type,
      |  octet_length(encode(text)) AS byte_len,
      |  (64 + octet_length(encode(text)) % 577)::INT AS width,
      |  (64 + (octet_length(encode(text)) * 31) % 419)::INT AS height
      |FROM documents ORDER BY asset_id""".stripMargin

  /** [[frameSample]] over the synthetic asset table — the frame-expansion
    * plumbing (one row per sampled frame, explode with no shuffle) under
    * the oracle gate.
    */
  def frameSampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(assets(spark, sfDir))
      .select(col("asset_id"), col("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"))
      .orderBy("asset_id", "frame_idx")

  val frameSampleSql: String =
    """WITH a AS (
      |  SELECT doc_id AS asset_id,
      |    (octet_length(encode(text)) % 97 + 1)::INT AS n_frames
      |  FROM documents)
      |SELECT asset_id, n_frames,
      |  unnest(generate_series(0, n_frames - 1, 10))::BIGINT AS frame_idx
      |FROM a ORDER BY asset_id, frame_idx""".stripMargin

  // ------------------------------------------------- frame-level dedup

  /** VIDEO NEAR-DUP DETECTION over the frame plumbing — the pipeline a
    * multimodal corpus runs to catch re-uploads and clipped copies: cut
    * each asset's content into fixed-width frames, signature each frame
    * (per-frame perceptual hash in production; here the deterministic
    * [[graft.functions.Hashes.polyHash]] of the frame content, so the
    * WHOLE pipeline — not just the plumbing — is oracle-checkable), and
    * score asset pairs by shared distinct signatures. Two assets are
    * near-dups when they share ≥ `minPermille`/1000 of the smaller one's
    * signature set — which catches a CLIPPED copy (missing prefix) that
    * whole-file fingerprints can never match.
    *
    * The corpus is augmented with deterministic planted clips (every
    * 37th document re-appears under `id + 1 000 000` with its first two
    * frames removed — derived identically in both engines) so the match
    * join is exercised with real rows at every sf.
    *
    * Scale shape: NO all-pairs anywhere — the pair source is the
    * signature-keyed self-join (an inverted index: only assets sharing a
    * frame meet), `maxDf` drops boilerplate signatures (the posting-cap
    * discipline — a frame appearing in > maxDf assets is an intro card,
    * not evidence), and only (asset, signature) id pairs shuffle — frame
    * content never travels past the map side. Overlap ratios are integer
    * permille (`n·1000 div min`) — exact in both engines, no float
    * rounding at the contract boundary.
    */
  def frameDedup(spark: SparkSession, sfDir: String, frameLen: Int = 16,
      maxDf: Int = 8, minPermille: Int = 500): DataFrame = {
    import graft.functions.Hashes
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.select(col("doc_id").as("asset_id"),
      col("text").as("content"))
    val clips = docs.filter(col("doc_id") % 37 === 0)
      .select((col("doc_id") + 1000000L).as("asset_id"),
        substring(col("text"), frameLen * 2 + 1, Int.MaxValue).as("content"))
    val assets = base.unionByName(clips)
      .filter(length(col("content")) >= frameLen)
    val sigs = assets
      .withColumn("frame_idx", explode(sequence(lit(0),
        floor(length(col("content")) / frameLen).cast("int") - 1)))
      .withColumn("piece",
        expr(s"substring(content, frame_idx * $frameLen + 1, $frameLen)"))
      .select(col("asset_id"), Hashes.polyHash(col("piece")).as("sig"))
      .distinct()
    val sizes = sigs.groupBy("asset_id")
      .agg(count(lit(1)).cast("long").as("n_sigs"))
    val rare = sigs.groupBy("sig").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sig")
    val kept = sigs.join(rare, "sig")
    val pairs = kept.select(col("sig"), col("asset_id").as("asset_a"))
      .join(kept.select(col("sig"), col("asset_id").as("asset_b")), "sig")
      .where(col("asset_a") < col("asset_b"))
      .groupBy("asset_a", "asset_b")
      .agg(count(lit(1)).cast("long").as("n_common"))
    pairs
      .join(sizes.withColumnRenamed("asset_id", "asset_a")
        .withColumnRenamed("n_sigs", "n_a"), "asset_a")
      .join(sizes.withColumnRenamed("asset_id", "asset_b")
        .withColumnRenamed("n_sigs", "n_b"), "asset_b")
      .withColumn("permille",
        expr("n_common * 1000 div least(n_a, n_b)").cast("long"))
      .filter(col("permille") >= minPermille)
      .select("asset_a", "asset_b", "n_common", "permille")
      .orderBy("asset_a", "asset_b")
  }

  def frameDedupSql(frameLen: Int = 16, maxDf: Int = 8,
      minPermille: Int = 500): String = {
    import graft.functions.Hashes
    s"""WITH assets AS (
       |  SELECT doc_id AS asset_id, text AS content FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, substring(text, ${frameLen * 2 + 1})
       |  FROM documents WHERE doc_id % 37 = 0),
       |ok AS (SELECT * FROM assets WHERE length(content) >= $frameLen),
       |frames AS (
       |  SELECT asset_id,
       |    unnest(generate_series(0,
       |      CAST(floor(length(content) * 1.0 / $frameLen) AS INT) - 1)) AS fi,
       |    content
       |  FROM ok),
       |pieces AS (
       |  -- the piece is materialized BEFORE hashing: polyHashSql's fold
       |  -- lambda binds its own index variable, which would capture a
       |  -- same-named column referenced inside its argument expression
       |  SELECT asset_id,
       |    substring(content, fi * $frameLen + 1, $frameLen) AS piece
       |  FROM frames),
       |sigs AS (
       |  SELECT DISTINCT asset_id, ${Hashes.polyHashSql("piece")} AS sig
       |  FROM pieces),
       |sizes AS (SELECT asset_id, CAST(count(*) AS BIGINT) AS n_sigs
       |          FROM sigs GROUP BY 1),
       |rare AS (SELECT sig FROM sigs GROUP BY sig HAVING count(*) <= $maxDf),
       |kept AS (SELECT s.* FROM sigs s JOIN rare r ON s.sig = r.sig),
       |pairs AS (
       |  SELECT x.asset_id AS asset_a, y.asset_id AS asset_b,
       |         CAST(count(*) AS BIGINT) AS n_common
       |  FROM kept x JOIN kept y ON x.sig = y.sig AND x.asset_id < y.asset_id
       |  GROUP BY 1, 2)
       |SELECT p.asset_a, p.asset_b, p.n_common,
       |  p.n_common * 1000 // least(sa.n_sigs, sb.n_sigs) AS permille
       |FROM pairs p
       |JOIN sizes sa ON p.asset_a = sa.asset_id
       |JOIN sizes sb ON p.asset_b = sb.asset_id
       |WHERE p.n_common * 1000 // least(sa.n_sigs, sb.n_sigs) >= $minPermille
       |ORDER BY asset_a, asset_b""".stripMargin
  }
}

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
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, and REAL decode / feature-extract / frame-sample stages.
  *
  * The decode is a genuine codec round trip: each asset is a deterministic
  * RGB "filmstrip" image (pixel values are a closed-form function of the
  * source id and the ABSOLUTE pixel coordinate), encoded to real PNG or
  * BMP bytes with `javax.imageio` at build time and decoded back with
  * `ImageIO.read` inside the per-partition feature stages. Both formats
  * are lossless, so every downstream number (channel sums, per-frame
  * signatures) is computed FROM DECODED PIXELS yet remains analytically
  * recomputable by the DuckDB oracle from the generator's formula — the
  * codec is real, and the oracle never needs to decode anything. (Video
  * codecs are genuinely absent from this container; the filmstrip — one
  * fixed-height band per frame — is the video stand-in, which is why
  * frame signatures are band functions.)
  *
  * At 100 TB: assets are processed partition-by-partition with constant
  * memory (iterator in, iterator out), never collected; only (asset_id,
  * signature)-shaped rows ever cross a shuffle — media bytes stay where
  * they were read.
  */
object Multimodal {

  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false)))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("fingerprint", LongType, nullable = false)))

  val FrameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("sig", LongType, nullable = false)))

  /** Deterministic image generator + real JDK codec. The pixel formula
    * uses the SOURCE id and the ABSOLUTE row (y0 + y), which is what
    * makes a clipped copy's decoded bands byte-identical to its source's
    * corresponding bands — the property frame-level dedup detects.
    */
  object Codec {
    val BandH = 4
    def widthOf(id: Long): Int = 8 + (id % 25).toInt
    def framesOf(id: Long): Int = 1 + (id % 12).toInt
    def formatOf(id: Long): String = if (id % 2 == 0) "png" else "bmp"
    def mediaTypeOf(id: Long): String = s"image/${formatOf(id)}"

    private def ch(v: Long): Int = math.floorMod(v, 256L).toInt

    /** Packed RGB of the generator at absolute coordinate (x, yAbs). */
    def pixel(srcId: Long, x: Int, yAbs: Int): Int = {
      val r = ch(x * 3L + yAbs * 5L + srcId)
      val g = ch(x * 7L + yAbs * 11L + srcId * 13L)
      val b = ch(x * 13L + yAbs * 17L + srcId * 19L)
      (r << 16) | (g << 8) | b
    }

    /** Encode the filmstrip starting at absolute row `y0` with `nFrames`
      * bands to real PNG/BMP bytes (both lossless in the JDK).
      */
    def encode(srcId: Long, y0: Int, nFrames: Int, format: String): Array[Byte] = {
      val w = widthOf(srcId)
      val h = BandH * nFrames
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val buf = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { buf(y * w + x) = pixel(srcId, x, y0 + y); x += 1 }
        y += 1
      }
      img.setRGB(0, 0, w, h, buf, 0, w)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }

    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
  }

  // in-memory ImageIO only: the default on-disk stream cache would add a
  // tmp-file write per decode on every executor thread
  javax.imageio.ImageIO.setUseCache(false)

  private def assetEncoder =
    org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(AssetSchema)

  /** Fan the id projection out across every core before the codec stage.
    * The documents table is one small parquet file → ONE input split, so
    * without this every ImageIO encode/decode runs on a single thread
    * (the whole features entry measured ~5 s single-threaded at sf0.1).
    * Only 8-byte ids cross this exchange — it parallelizes the synthetic
    * asset GENERATOR; in production assets arrive already distributed
    * and no such fan-out stage exists.
    */
  private def fanOut(ids: DataFrame): DataFrame =
    ids.repartition(ids.sparkSession.sparkContext.defaultParallelism)

  /** Build the binary asset table: one real encoded image per document id
    * (PNG for even ids, BMP for odd — both decode paths stay exercised).
    */
  def assets(spark: SparkSession, sfDir: String): DataFrame =
    fanOut(Tables.documents(spark, sfDir).select("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = Codec.encode(id, 0, Codec.framesOf(id), Codec.formatOf(id))
          Row(id, bytes, Codec.mediaTypeOf(id), bytes.length.toLong)
        }
      }(assetEncoder)

  /** Base corpus plus planted CLIPPED copies: every 37th document with at
    * least 3 frames re-appears under `id + 1 000 000` with its first two
    * frames removed — a separately ENCODED image whose decoded bands
    * match the source's bands 2.. pixel-for-pixel (absolute-coordinate
    * generator). This is what re-upload detection must catch.
    */
  def assetsWithClips(spark: SparkSession, sfDir: String): DataFrame =
    fanOut(Tables.documents(spark, sfDir).select("doc_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val base = {
            val bytes = Codec.encode(id, 0, Codec.framesOf(id), Codec.formatOf(id))
            Row(id, bytes, Codec.mediaTypeOf(id), bytes.length.toLong)
          }
          if (id % 37 == 0 && Codec.framesOf(id) >= 3) {
            val bytes = Codec.encode(id, 2 * Codec.BandH, Codec.framesOf(id) - 2,
              Codec.formatOf(id))
            Seq(base,
              Row(id + 1000000L, bytes, Codec.mediaTypeOf(id), bytes.length.toLong))
          } else Seq(base)
        }
      }(assetEncoder)

  /** Per-partition feature extraction over REAL decoded pixels:
    * dimensions, per-channel sums, and an FNV-1a fingerprint of the
    * row-major pixel stream (the perceptual-hash stand-in). Iterator
    * in/iterator out, constant memory, no driver involvement.
    */
  def extractFeatures(spark: SparkSession, assetsDf: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(FeatureSchema)
    assetsDf.select("asset_id", "media", "media_type").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val img = Codec.decode(r.getAs[Array[Byte]](1))
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w) // one bulk raster read
        var (sr, sg, sb) = (0L, 0L, 0L)
        var fp = 0xcbf29ce484222325L
        var i = 0
        while (i < px.length) {
          val rgb = px(i)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          fp ^= rgb & 0xffffffL; fp *= 0x100000001b3L
          i += 1
        }
        Row(id, r.getString(2), w, h, 3, sr, sg, sb, fp)
      }
    }(enc)
  }

  /** Per-frame band signatures from REAL decoded pixels: one row per
    * band, sig = Σ packedRGB(x,yl) · (1 + x + w·yl) over the band's
    * LOCAL coordinates — local weights are what make a clip's band sig
    * equal its source band's sig, and the closed-form weighted sum is
    * what keeps the oracle decode-free. Fits a long with > 20 bits to
    * spare (rgb < 2^24, weight ≤ 160, pixels ≤ 128).
    */
  def frameSignatures(spark: SparkSession, assetsDf: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(FrameSchema)
    assetsDf.select("asset_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val img = Codec.decode(r.getAs[Array[Byte]](1))
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w) // one bulk raster read
        val nFrames = h / Codec.BandH
        (0 until nFrames).map { f =>
          var sig = 0L
          var yl = 0
          while (yl < Codec.BandH) {
            var x = 0
            while (x < w) {
              sig += (px((f * Codec.BandH + yl) * w + x) & 0xffffff).toLong *
                (1 + x + w * yl)
              x += 1
            }
            yl += 1
          }
          Row(id, nFrames, f, sig)
        }
      }
    }(enc)
  }

  // shared SQL fragments: the generator's closed form, as the oracle
  // recomputes it (x/yy are absolute coordinates, sid the source id)
  private def chanSql(expr: String) = s"(($expr) % 256)"
  // packed like TYPE_INT_RGB: r<<16 | g<<8 | b
  private val rgbSql =
    s"65536*${chanSql("x*3 + yy*5 + sid")}" +
      s" + 256*${chanSql("x*7 + yy*11 + sid*13")}" +
      s" + ${chanSql("x*13 + yy*17 + sid*19")}"

  /** Oracle-gated feature surface: real decode on the Spark side, pure
    * closed-form pixel arithmetic on the oracle side — equality proves
    * the encode→PNG/BMP→decode round trip is lossless AND the decoded
    * pixel stream is read correctly (fingerprint is spec-covered; its
    * row-major order has no cheap SQL form).
    */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(spark, assets(spark, sfDir))
      .select("asset_id", "media_type", "width", "height", "n_channels",
        "sum_r", "sum_g", "sum_b")
      .orderBy("asset_id")

  val featuresSql: String =
    s"""WITH d AS (
       |  SELECT doc_id AS asset_id, doc_id AS sid,
       |         (8 + doc_id % 25)::INT AS w,
       |         (4 * (1 + doc_id % 12))::INT AS h
       |  FROM documents),
       |xs AS (
       |  SELECT asset_id, sid, w, h,
       |         unnest(generate_series(0, w - 1)) AS x FROM d),
       |px AS (
       |  SELECT asset_id, sid, w, h, x,
       |         unnest(generate_series(0, h - 1)) AS yy FROM xs)
       |SELECT asset_id,
       |  CASE WHEN asset_id % 2 = 0 THEN 'image/png' ELSE 'image/bmp' END
       |    AS media_type,
       |  w AS width, h AS height, 3 AS n_channels,
       |  CAST(sum((x*3 + yy*5 + sid) % 256) AS BIGINT) AS sum_r,
       |  CAST(sum((x*7 + yy*11 + sid*13) % 256) AS BIGINT) AS sum_g,
       |  CAST(sum((x*13 + yy*17 + sid*19) % 256) AS BIGINT) AS sum_b
       |FROM px
       |GROUP BY asset_id, w, h ORDER BY asset_id""".stripMargin

  /** Frame-sampling surface: every `stride`-th band of each decoded
    * filmstrip with its pixel signature — the row-multiplying stage a
    * video pipeline runs before frame-level dedup/embedding, over real
    * decoded bytes.
    */
  def frameSampleQuery(spark: SparkSession, sfDir: String,
      stride: Int = 2): DataFrame =
    frameSignatures(spark, assets(spark, sfDir))
      .filter(col("frame_idx") % stride === 0)
      .select(col("asset_id"), col("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"), col("sig"))
      .orderBy("asset_id", "frame_idx")

  def frameSampleSql(stride: Int = 2): String =
    s"""WITH d AS (
       |  SELECT doc_id AS asset_id, doc_id AS sid,
       |         (8 + doc_id % 25)::INT AS w,
       |         (1 + doc_id % 12)::INT AS nf
       |  FROM documents),
       |bands0 AS (
       |  SELECT asset_id, sid, w, nf,
       |         unnest(generate_series(0, nf - 1)) AS fi FROM d),
       |bands AS (SELECT * FROM bands0 WHERE fi % $stride = 0),
       |xs AS (
       |  SELECT asset_id, sid, w, nf, fi,
       |         unnest(generate_series(0, w - 1)) AS x FROM bands),
       |ys AS (
       |  SELECT asset_id, sid, w, nf, fi, x,
       |         unnest(generate_series(0, 3)) AS yl FROM xs),
       |px AS (
       |  SELECT asset_id, nf, fi,
       |         ($rgbSql) * (1 + x + w*yl) AS wv
       |  FROM (SELECT *, fi*4 + yl AS yy FROM ys))
       |SELECT asset_id, nf AS n_frames, fi::BIGINT AS frame_idx,
       |       CAST(sum(wv) AS BIGINT) AS sig
       |FROM px GROUP BY asset_id, nf, fi
       |ORDER BY asset_id, frame_idx""".stripMargin

  // ------------------------------------------------- frame-level dedup

  /** VIDEO NEAR-DUP DETECTION over real decoded frames — the pipeline a
    * multimodal corpus runs to catch re-uploads and clipped copies:
    * decode each asset's filmstrip, signature each band from its pixels
    * ([[frameSignatures]]), and score asset pairs by shared distinct
    * signatures. Two assets are near-dups when they share ≥
    * `minPermille`/1000 of the smaller one's signature set — which
    * catches a CLIPPED copy (missing leading frames) that whole-file
    * fingerprints can never match, because the clip is a different
    * encoded artifact whose DECODED bands still equal the source's.
    *
    * Scale shape: NO all-pairs anywhere — the pair source is the
    * signature-keyed self-join (an inverted index: only assets sharing a
    * band meet), `maxDf` drops boilerplate signatures (a band appearing
    * in > maxDf assets is an intro card, not evidence), and only
    * (asset, signature) id pairs shuffle — media bytes never travel past
    * the map side. Overlap ratios are integer permille (`n·1000 div
    * min`) — exact in both engines, no float rounding at the contract
    * boundary.
    */
  def frameDedup(spark: SparkSession, sfDir: String, maxDf: Int = 8,
      minPermille: Int = 500): DataFrame = {
    val sigs = frameSignatures(spark, assetsWithClips(spark, sfDir))
      .select("asset_id", "sig").distinct()
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

  def frameDedupSql(maxDf: Int = 8, minPermille: Int = 500): String =
    s"""WITH src AS (
       |  SELECT doc_id AS asset_id, doc_id AS sid, 0 AS y0,
       |         (8 + doc_id % 25)::INT AS w, (1 + doc_id % 12)::INT AS nf
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, doc_id, 8,
       |         (8 + doc_id % 25)::INT, (doc_id % 12 - 1)::INT
       |  FROM documents WHERE doc_id % 37 = 0 AND doc_id % 12 >= 2),
       |bands AS (
       |  SELECT asset_id, sid, y0, w,
       |         unnest(generate_series(0, nf - 1)) AS fi FROM src),
       |xs AS (
       |  SELECT asset_id, sid, y0, w, fi,
       |         unnest(generate_series(0, w - 1)) AS x FROM bands),
       |ys AS (
       |  SELECT asset_id, sid, y0, w, fi, x,
       |         unnest(generate_series(0, 3)) AS yl FROM xs),
       |px AS (
       |  SELECT asset_id, fi,
       |         ($rgbSql) * (1 + x + w*yl) AS wv
       |  FROM (SELECT *, y0 + fi*4 + yl AS yy FROM ys)),
       |sigs0 AS (
       |  SELECT asset_id, fi, CAST(sum(wv) AS BIGINT) AS sig
       |  FROM px GROUP BY asset_id, fi),
       |sigs AS (SELECT DISTINCT asset_id, sig FROM sigs0),
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

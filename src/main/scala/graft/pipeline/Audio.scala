package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Audio-modality plumbing: PCM audio as opaque `binary` WAV columns, with
  * REAL container round trips — the sibling of [[Multimodal]]'s image
  * codec, completing the audio leg of the media-column family.
  *
  * The codec is a genuine RIFF/WAVE implementation: each asset is a
  * deterministic PCM16 mono signal (every sample a closed-form integer
  * function of the source id and the sample index), serialized to real
  * WAV bytes — RIFF header, `fmt ` chunk, an optional `LIST` metadata
  * chunk, `data` chunk, little-endian PCM16 — and parsed back by a
  * chunk-WALKING decoder (magic checks, fmt validation, arbitrary chunk
  * order/padding) inside the per-partition feature stages. PCM is
  * lossless, so every downstream number (energy, zero crossings, silence
  * windows, decimated checksums) is computed FROM DECODED SAMPLES yet
  * remains exactly recomputable by the DuckDB oracle from the
  * generator's formula — the container is real, and the oracle never
  * parses a byte. The `LIST` chunk (planted on every third asset) is
  * what keeps the parser honest: a fixed-offset-44 "decoder" would read
  * garbage there, and the oracle gate would catch it.
  *
  * At 100 TB: identical shape to the image stages — assets are processed
  * partition-by-partition with constant memory (iterator in, iterator
  * out), never collected; only (asset_id, scalar)-shaped rows ever cross
  * a shuffle, media bytes stay where they were read.
  */
object Audio {

  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false)))

  /** Silence segmentation window, in samples. */
  val WindowSamples = 256
  /** A window is silent iff max |sample| < this (decoded-domain rule). */
  val SilenceMaxAbs = 16
  /** A sample counts as clipped iff |sample| >= this. */
  val ClipAbs = 32000

  /** Deterministic PCM generator + real RIFF/WAVE codec. All sample
    * arithmetic is non-negative-operand integer modulo, so Spark and the
    * SQL oracle agree exactly.
    */
  object Codec {
    def rateOf(id: Long): Int = if (id % 2 == 0) 8000 else 16000
    def nSamplesOf(id: Long): Int = 1024 + (id % 5).toInt * 256
    /** Every third asset carries a LIST metadata chunk before `data`. */
    def hasListChunk(id: Long): Boolean = id % 3 == 0

    /** The signal: windows of [[WindowSamples]] are either "silent"
      * (|s| <= 3) or "voiced" (a full-range modular sweep), chosen by
      * `(id + window) % 5 < 2`. Voiced neighbours step 104729 mod 65521
      * apart, so no voiced window can sit entirely under the silence
      * threshold — the decoded-domain silence rule recovers exactly the
      * generator's window labels.
      */
    def sample(id: Long, i: Int): Int = {
      val win = i / WindowSamples
      if ((id + win) % 5 < 2) ((id + i) % 7).toInt - 3
      else ((id * 7919L + i * 104729L) % 65521L).toInt - 32760
    }

    private def wLE16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
    }
    private def wLE32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
      b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
    }
    private def wTag(b: java.io.ByteArrayOutputStream, t: String): Unit =
      b.write(t.getBytes("US-ASCII"))

    /** Serialize PCM16 mono samples as a real WAV file. `withList` adds
      * a LIST/INFO chunk between `fmt ` and `data` — the parser-honesty
      * plant.
      */
    def encode(samples: Array[Int], rate: Int, withList: Boolean): Array[Byte] = {
      val dataLen = samples.length * 2
      val listPayload = "INFOISFT".getBytes("US-ASCII") // 8 bytes, even
      val listLen = if (withList) 8 + listPayload.length else 0
      val b = new java.io.ByteArrayOutputStream(44 + listLen + dataLen)
      wTag(b, "RIFF"); wLE32(b, 4 + 24 + listLen + 8 + dataLen); wTag(b, "WAVE")
      wTag(b, "fmt "); wLE32(b, 16)
      wLE16(b, 1)           // PCM
      wLE16(b, 1)           // mono
      wLE32(b, rate)
      wLE32(b, rate * 2)    // byte rate
      wLE16(b, 2)           // block align
      wLE16(b, 16)          // bits per sample
      if (withList) { wTag(b, "LIST"); wLE32(b, listPayload.length); b.write(listPayload) }
      wTag(b, "data"); wLE32(b, dataLen)
      var i = 0
      while (i < samples.length) { wLE16(b, samples(i) & 0xffff); i += 1 }
      b.toByteArray
    }

    private def le16(a: Array[Byte], o: Int): Int =
      (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8)
    private def le32(a: Array[Byte], o: Int): Int =
      (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) |
        ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)
    private def tag(a: Array[Byte], o: Int): String =
      new String(a, o, 4, "US-ASCII")

    /** Parse WAV bytes back to (sampleRate, samples). A real chunk walk:
      * verifies RIFF/WAVE magic, iterates chunks in whatever order they
      * appear (honouring even-byte padding), validates `fmt ` as PCM16
      * mono, and refuses loudly on anything else — never assumes the
      * fixed 44-byte layout.
      */
    def decode(bytes: Array[Byte]): (Int, Array[Int]) = {
      require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
        tag(bytes, 8) == "WAVE", "not a RIFF/WAVE stream")
      var off = 12
      var rate = -1
      var samples: Array[Int] = null
      while (off + 8 <= bytes.length) {
        val id = tag(bytes, off)
        val sz = le32(bytes, off + 4)
        require(sz >= 0 && off + 8 + sz <= bytes.length,
          s"chunk '$id' overruns the stream")
        id match {
          case "fmt " =>
            require(sz >= 16, "fmt chunk too short")
            require(le16(bytes, off + 8) == 1, "not PCM")
            require(le16(bytes, off + 10) == 1, "not mono")
            rate = le32(bytes, off + 12)
            require(le16(bytes, off + 22) == 16, "not 16-bit")
          case "data" =>
            require(rate > 0, "data chunk before fmt")
            require(sz % 2 == 0, "odd PCM16 data length")
            val n = sz / 2
            val out = new Array[Int](n)
            var i = 0
            while (i < n) {
              out(i) = le16(bytes, off + 8 + 2 * i).toShort.toInt
              i += 1
            }
            samples = out
          case _ => () // LIST / unknown metadata: skip
        }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(samples != null, "no data chunk")
      (rate, samples)
    }
  }

  private def assetEncoder =
    org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(AssetSchema)

  /** Fan the id projection out across every core before the codec stage —
    * same rationale as [[Multimodal.assets]]: the documents table is one
    * input split, and only 8-byte ids cross this exchange.
    */
  private def fanOut(ids: DataFrame): DataFrame =
    ids.repartition(ids.sparkSession.sparkContext.defaultParallelism)

  /** Build the binary asset table: one real WAV per document id. */
  def assets(spark: SparkSession, sfDir: String): DataFrame =
    fanOut(Tables.documents(spark, sfDir).select("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val s = Array.tabulate(Codec.nSamplesOf(id))(Codec.sample(id, _))
          val bytes = Codec.encode(s, Codec.rateOf(id), Codec.hasListChunk(id))
          Row(id, bytes, "audio/wav", bytes.length.toLong)
        }
      }(assetEncoder)

  private val featureSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("duration_ms", IntegerType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("zero_crossings", IntegerType, nullable = false),
    StructField("clipped", IntegerType, nullable = false)))

  /** Per-partition signal features over REAL decoded samples: peak
    * amplitude, energy (Σ s²), zero crossings (sign changes with 0
    * counted non-negative), clipping count. Iterator in/iterator out.
    */
  def extractFeatures(spark: SparkSession, assetsDf: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    assetsDf.select("asset_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (rate, s) = Codec.decode(r.getAs[Array[Byte]](1))
        var peak = 0
        var sumSq = 0L
        var zc = 0
        var clipped = 0
        var i = 0
        while (i < s.length) {
          val v = s(i)
          val a = math.abs(v)
          if (a > peak) peak = a
          sumSq += v.toLong * v
          if (a >= ClipAbs) clipped += 1
          if (i > 0 && ((v >= 0) != (s(i - 1) >= 0))) zc += 1
          i += 1
        }
        Row(id, rate, s.length, s.length * 1000 / rate, peak, sumSq, zc, clipped)
      }
    }(enc)
  }

  /** Oracle-gated feature surface: real WAV parse on the Spark side,
    * pure closed-form sample arithmetic on the oracle side — equality
    * proves the RIFF round trip (including the planted LIST chunk) is
    * lossless and the PCM16 sign decode is correct.
    */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(spark, assets(spark, sfDir)).orderBy("asset_id")

  /** The generator's closed form, as the oracle recomputes it (sid the
    * source id, i the sample index).
    */
  private val sampleSql =
    "CASE WHEN (sid + i // 256) % 5 < 2 THEN (sid + i) % 7 - 3 " +
      "ELSE (sid * 7919 + i * 104729) % 65521 - 32760 END"

  private val samplesCte =
    s"""WITH d AS (
       |  SELECT doc_id AS asset_id, doc_id AS sid,
       |         (1024 + (doc_id % 5) * 256)::INT AS n,
       |         CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate
       |  FROM documents),
       |sm AS (
       |  SELECT asset_id, n, rate, i, $sampleSql AS s
       |  FROM (SELECT asset_id, sid, n, rate,
       |               unnest(generate_series(0, n - 1)) AS i FROM d))""".stripMargin

  val featuresSql: String =
    s"""$samplesCte,
       |lagged AS (
       |  SELECT asset_id, n, rate, s,
       |         lag(s) OVER (PARTITION BY asset_id ORDER BY i) AS prev
       |  FROM sm)
       |SELECT asset_id, rate AS sample_rate, n AS n_samples,
       |  (n * 1000 // rate)::INT AS duration_ms,
       |  CAST(max(abs(s)) AS INT) AS peak,
       |  CAST(sum(s * s) AS BIGINT) AS sum_sq,
       |  CAST(sum(CASE WHEN prev IS NOT NULL AND (s >= 0) <> (prev >= 0)
       |           THEN 1 ELSE 0 END) AS INT) AS zero_crossings,
       |  CAST(sum(CASE WHEN abs(s) >= $ClipAbs THEN 1 ELSE 0 END) AS INT)
       |    AS clipped
       |FROM lagged GROUP BY asset_id, n, rate ORDER BY asset_id""".stripMargin

  private val silenceSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_windows", IntegerType, nullable = false),
    StructField("silent_windows", IntegerType, nullable = false),
    StructField("longest_run", IntegerType, nullable = false)))

  /** Silence segmentation over REAL decoded samples: fixed windows of
    * [[WindowSamples]], a window is silent iff its max |sample| is under
    * [[SilenceMaxAbs]]; reports the count and the longest consecutive
    * silent run — the trim-points a speech pipeline cuts on.
    */
  def silence(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(silenceSchema)
    assets(spark, sfDir).select("asset_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (_, s) = Codec.decode(r.getAs[Array[Byte]](1))
        val nWin = s.length / WindowSamples
        var silent = 0
        var run = 0
        var best = 0
        var w = 0
        while (w < nWin) {
          var mx = 0
          var i = w * WindowSamples
          val end = i + WindowSamples
          while (i < end) { val a = math.abs(s(i)); if (a > mx) mx = a; i += 1 }
          if (mx < SilenceMaxAbs) { silent += 1; run += 1; if (run > best) best = run }
          else run = 0
          w += 1
        }
        Row(id, nWin, silent, best)
      }
    }(enc).orderBy("asset_id")
  }

  val silenceSql: String =
    s"""$samplesCte,
       |winagg AS (
       |  SELECT asset_id, i // $WindowSamples AS win,
       |         (max(abs(s)) < $SilenceMaxAbs) AS is_silent
       |  FROM sm GROUP BY asset_id, i // $WindowSamples),
       |runs AS (
       |  SELECT asset_id, count(*) AS run_len
       |  FROM (SELECT asset_id, win,
       |               win - row_number() OVER
       |                 (PARTITION BY asset_id ORDER BY win) AS grp
       |        FROM winagg WHERE is_silent)
       |  GROUP BY asset_id, grp)
       |SELECT w.asset_id,
       |  CAST(count(*) AS INT) AS n_windows,
       |  CAST(sum(CASE WHEN w.is_silent THEN 1 ELSE 0 END) AS INT)
       |    AS silent_windows,
       |  CAST(coalesce(max(r.longest), 0) AS INT) AS longest_run
       |FROM winagg w
       |LEFT JOIN (SELECT asset_id, max(run_len) AS longest
       |           FROM runs GROUP BY asset_id) r USING (asset_id)
       |GROUP BY w.asset_id ORDER BY w.asset_id""".stripMargin

  private val downsampleSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("out_rate", IntegerType, nullable = false),
    StructField("n_out", IntegerType, nullable = false),
    StructField("peak_out", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** 2:1 decimation with pair averaging (floor), then a SECOND full
    * container round trip: the decimated signal is re-ENCODED as a new
    * WAV at half the rate and re-DECODED before aggregation — the
    * output numbers come from second-generation bytes, proving the
    * writer produces streams its own parser (and any WAV reader)
    * accepts. checksum = Σ out[j]·(j+1) pins order, not just content.
    */
  def downsample(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(downsampleSchema)
    assets(spark, sfDir).select("asset_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (rate, s) = Codec.decode(r.getAs[Array[Byte]](1))
        val out = Array.tabulate(s.length / 2)(j =>
          Math.floorDiv(s(2 * j) + s(2 * j + 1), 2))
        val (rate2, s2) = Codec.decode(Codec.encode(out, rate / 2, withList = false))
        var peak = 0
        var sum = 0L
        var j = 0
        while (j < s2.length) {
          val a = math.abs(s2(j))
          if (a > peak) peak = a
          sum += s2(j).toLong * (j + 1)
          j += 1
        }
        Row(id, rate2, s2.length, peak, sum)
      }
    }(enc).orderBy("asset_id")
  }

  val downsampleSql: String =
    s"""$samplesCte,
       |pairs AS (
       |  SELECT asset_id, rate, i // 2 AS j,
       |         CAST(floor(sum(s) / 2.0) AS BIGINT) AS o
       |  FROM sm GROUP BY asset_id, rate, i // 2)
       |SELECT asset_id,
       |  (rate // 2)::INT AS out_rate,
       |  CAST(count(*) AS INT) AS n_out,
       |  CAST(max(abs(o)) AS INT) AS peak_out,
       |  CAST(sum(o * (j + 1)) AS BIGINT) AS checksum
       |FROM pairs GROUP BY asset_id, rate ORDER BY asset_id""".stripMargin
}

package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.apache.hadoop.fs.Path

import graft.pipeline.Stores

/** Per-file partial bloom + stats (top-level: Spark's codegen'd encoder
  * must be able to construct it; a private nested class is invisible to
  * the generated Java).
  */
private[sources] case class BloomPartial(f: String, bloom: Array[Byte],
    n: Long, mn: Long, mx: Long)

/** PER-FILE BLOOM SKIPPING INDEX for point lookups — the Delta/Iceberg
  * bloom-filter-index capability, for the key shape min/max skipping
  * cannot help with: a key UNCORRELATED with the physical layout (uuids,
  * content hashes), where every file's [min,max] spans the whole domain
  * but each key really lives in one file.
  *
  * Build is ONE pass over the table with only sketch bytes ever crossing
  * a shuffle: each input split folds its rows into per-file partial
  * blooms + min/max/count locally (`mapPartitions`, constant memory —
  * a split covers one file, or a few small ones), and only those
  * fixed-size partials shuffle to merge per file (bloom insertion is a
  * bitwise OR, so partial merge is exact and order-independent — the
  * same algebraic-aggregate argument as HLL in `table_stats_approx`).
  * The merged stats collect to the driver FILE-COUNT-sized and land in
  * one JSON sidecar.
  *
  * Lookup prunes DRIVER-SIDE from the sidecar alone: a file is scanned
  * only if some probe key is inside its [min,max] AND its bloom says
  * maybe-present. False positives cost one extra file scan (bounded by
  * fpp × files); false negatives cannot happen (no-false-negative is
  * the bloom contract, spec-pinned against brute force). At 100 TB the
  * sidecar for a million-file table is ~bloomBytes × files — the same
  * metadata-scaling argument as the versioned manifest, and the reason
  * engines bound `fpp` rather than bloom size per file.
  */
object BloomSkipIndex {

  /** Fixed build parameters: every partial MUST use the same (numBits,
    * numHashes) to merge, and determinism of the sidecar bytes (spec:
    * two builds are byte-identical) rides on them being constants.
    */
  val ExpectedPerFile: Long = 100000
  val Fpp: Double = 0.01

  private def ser(b: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  private def deser(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Build the sidecar at `indexPath` for the LONG key column `keyCol`
    * of `df` — which must be a direct parquet scan (`input_file_name`
    * attributes rows to files).
    */
  def build(df: DataFrame, keyCol: String, indexPath: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df
      .select(col(keyCol).cast("long").as("_1"), input_file_name().as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val acc = mutable.HashMap.empty[String, (BloomFilter, Array[Long])]
        it.foreach { case (k, f) =>
          val (b, s) = acc.getOrElseUpdate(f,
            (BloomFilter.create(ExpectedPerFile, Fpp),
              Array(0L, Long.MaxValue, Long.MinValue)))
          b.putLong(k)
          s(0) += 1; if (k < s(1)) s(1) = k; if (k > s(2)) s(2) = k
        }
        acc.iterator.map { case (f, (b, s)) => BloomPartial(f, ser(b), s(0), s(1), s(2)) }
      }
    val merged = partials.groupByKey(_.f).mapGroups { (f, ps) =>
      var bloom: BloomFilter = null
      var (n, mn, mx) = (0L, Long.MaxValue, Long.MinValue)
      ps.foreach { p =>
        val b = deser(p.bloom)
        if (bloom == null) bloom = b else bloom.mergeInPlace(b)
        n += p.n; mn = math.min(mn, p.mn); mx = math.max(mx, p.mx)
      }
      BloomPartial(f, ser(bloom), n, mn, mx)
    }.collect().sortBy(_.f) // file-count-sized; sorted for byte determinism
    val enc = java.util.Base64.getEncoder
    val json = merged.map { p =>
      s"""{"file":"${p.f}","n":${p.n},"min":${p.mn},"max":${p.mx},""" +
        s""""bloom":"${enc.encodeToString(p.bloom)}"}"""
    }.mkString("[", ",", "]")
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(indexPath), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private case class FileStats(f: String, n: Long, mn: Long, mx: Long,
      bloom: BloomFilter)

  private def readSidecar(spark: SparkSession, indexPath: String): Seq[FileStats] = {
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(indexPath))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val dec = java.util.Base64.getDecoder
    // hand-rolled parse of the hand-rolled JSON above (house pattern:
    // no JSON lib on the unmanaged classpath); fields are ordered
    val entry = """\{"file":"([^"]+)","n":(\d+),"min":(-?\d+),"max":(-?\d+),"bloom":"([^"]+)"\}""".r
    entry.findAllMatchIn(text).map { m =>
      FileStats(m.group(1), m.group(2).toLong, m.group(3).toLong,
        m.group(4).toLong, deser(dec.decode(m.group(5))))
    }.toSeq
  }

  /** Point lookup: prune files from the sidecar, scan only survivors,
    * filter exactly. Returns the rows plus (filesScanned, filesTotal) —
    * the skipping evidence the spec pins.
    */
  def lookup(spark: SparkSession, indexPath: String, keyCol: String,
      keys: Seq[Long]): (DataFrame, Int, Int) = {
    val stats = readSidecar(spark, indexPath)
    val kept = stats.filter(st =>
      keys.exists(k => k >= st.mn && k <= st.mx && st.bloom.mightContainLong(k)))
    val df =
      if (kept.isEmpty)
        // schema comes from the full file set without scanning data
        spark.read.parquet(stats.map(_.f): _*).limit(0)
      else spark.read.parquet(kept.map(_.f): _*)
    (df.filter(col(keyCol).isin(keys: _*)), kept.size, stats.size)
  }

  // --------------------------- surface entry

  /** Oracle-gated point-lookup entry: a versioned events table carries a
    * surrogate `uid = xxhash64(event_id)` — decorrelated from the date
    * layout, so every leaf's [min,max] spans the whole uid domain and
    * ONLY the bloom can prune (`event_id` itself is time-ordered and
    * would be pruned by min/max alone — the easy case the layout family
    * already covers). The entry looks up the uids of every
    * `event_id % 1000 = 7` row and returns those rows; the oracle
    * selects the same rows by the id predicate directly. Row equality
    * proves no bloom false negative survived the pruning; the skipping
    * ratio itself is pinned in BloomSkipIndexSpec.
    */
  def pointLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("pdate", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("uid", xxhash64(col("event_id")))
      .select("event_id", "uid", "user_id", "event_type", "pdate")
    val dir = Stores.temp("graft_bloomidx")
    VersionedTable.create(ev, dir, "pdate")
    val index = s"$dir/index/bloom-uid.json"
    build(VersionedTable.readLatest(spark, dir), "uid", index)
    val keys = ev.filter(col("event_id") % 1000 === 7)
      .select("uid").collect().map(_.getLong(0)).toSeq
    val (rows, _, _) = lookup(spark, index, "uid", keys)
    rows.select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")
  }

  val pointLookupSql: String =
    """SELECT event_id, user_id, event_type FROM events
      |WHERE event_id % 1000 = 7 ORDER BY event_id""".stripMargin
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Build-once / probe-many IVF-PQ index store — the production shape of
  * [[ProductQuant.knnIvfPq]]: a similarity-search service trains its index
  * ONCE over the corpus and then serves many query batches against the
  * persisted artifact; it never re-runs coarse k-means or codebook training
  * per query the way the one-shot `knn_ivfpq` entry (deliberately, as a
  * self-contained benchmark) does. Mirrors the persisted-store pattern
  * established by [[IncrementalDedup]].
  *
  * Store layout under `storeDir` (all parquet):
  *   - `centroids/` — (centroid_id, cv ARRAY<DOUBLE>): the coarse IVF
  *     centroids. Parameter-bounded (k rows), read to the driver per probe.
  *   - `codebooks/` — (s, code_id, cq ARRAY<BIGINT>): the m per-subspace
  *     residual codebooks. m × k rows, driver-held per probe.
  *   - `codes/`     — (vec_id, cell, codes ARRAY<BIGINT>), hive-partitioned
  *     by `shard = pmod(cell, CellShards)` with files CELL-SORTED inside
  *     each shard: one row per corpus vector — its IVF cell plus the m PQ
  *     code ids of its residual. This is the ONLY corpus-sized table, and
  *     the only one a probe scans: the FAISS IVFPQ storage model (cell id +
  *     m codes per vector; at 100 TB of raw embeddings the codes table is
  *     ~64× smaller and is what keeps the whole index scannable per query).
  *   - `vectors/` (streaming stores) — raw vectors, partitioned by
  *     `shard = pmod(vec_id, VecShards)` — id-keyed, NOT cell-keyed, so a
  *     takedown's affected shards are a pure function of its id list and
  *     the layout survives [[reclusterStore]] unchanged.
  *   - `health/`    — per-cell (n_vecs, sum_energy) snapshot taken at
  *     build time, the baseline [[storeHealth]] reports drift against.
  *
  * Sharding is by pmod into a FIXED shard count — not one directory per
  * cell, which at √n..n/stride cells would mean millions of partition
  * dirs at corpus scale. A fixed fan-out keeps the metadata bounded while
  * still giving [[deleteFromStore]] its partition-rewrite fast path
  * (rewrite only affected shard leaves — the product core's S4 dynamic-
  * partition-overwrite shape applied to the derived store) and a probe its
  * partition pruning (wanted cells → wanted shards) plus row-group pruning
  * on the cell-sorted files within each shard.
  *
  * A probe's distributed work is one pass over `codes/` pruned to the
  * query cells' shards (partition pruning) and row groups (the `cell`
  * predicate reaches the parquet scan) doing m table lookups per vector —
  * no training job, no embeddings scan, nothing corpus-sized collected.
  * The plan spec pins all three properties.
  *
  * Arithmetic is identical to [[ProductQuant.knnIvfPq]] end to end (same
  * integer quantization, residuals, Lloyd rounds, ADC scoring), so
  * build+probe over the same corpus reproduces `knn_ivfpq` bit-for-bit and
  * shares its DuckDB oracle ([[ProductQuant.knnIvfPqSql]]).
  */
object AnnIndex {

  def centroidsPath(storeDir: String): String = s"$storeDir/centroids"
  def codebooksPath(storeDir: String): String = s"$storeDir/codebooks"
  def codesPath(storeDir: String): String = s"$storeDir/codes"
  def vectorsPath(storeDir: String): String = s"$storeDir/vectors"
  def healthPath(storeDir: String): String = s"$storeDir/health"

  /** DEFAULT shard fan-outs (see the layout note above). Not
    * corpus-derived at query time: partition-dir count must stay bounded
    * as the corpus grows, and a delete's shard arithmetic must reproduce
    * the build's — so the fan-out is a STORE-CREATION parameter
    * ([[StoreParams]], recorded next to the data like a partition spec;
    * at 100 TB it is a capacity decision), and every probe/append/delete
    * path reads the recorded value. Stores without the record (legacy)
    * keep these defaults.
    */
  val CellShards = 32
  val VecShards = 32

  private[graft] def cellShardsOf(spark: SparkSession,
      storeDir: String): Int =
    StoreParams.int(spark, storeDir, "cellShards", CellShards)

  private[graft] def vecShardsOf(spark: SparkSession,
      storeDir: String): Int =
    StoreParams.int(spark, storeDir, "vecShards", VecShards)

  /** Read `codes/` back in the canonical (vec_id, cell, codes, shard)
    * column order — partition columns come LAST and type-infer as INT on
    * read, so every consumer goes through this normalization instead of
    * positional decoding against the raw read schema.
    */
  private[graft] def readCodes(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(codesPath(storeDir))
      .select(col("vec_id"), col("cell"), col("codes"),
        col("shard").cast("int").as("shard"))

  /** Train and persist the IVF-PQ index from a (vec_id, embedding) frame.
    * One heavy pass assigns cells + residuals (staged so codebook training
    * and encoding don't recompute it), `iters` integer Lloyd rounds train
    * the codebooks, one staged pass encodes every vector to its m code ids.
    */
  def buildStore(embeddings: DataFrame, storeDir: String,
      ivfStride: Int = 50, m: Int = 16, codeStride: Int = 40,
      iters: Int = 2, dim: Int = 64,
      cellShards: Int = CellShards, vecShards: Int = VecShards): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(cellShards > 0 && vecShards > 0,
      s"shard fan-outs must be positive: cell=$cellShards vec=$vecShards")
    // recorded FIRST — every later append/probe/delete reads it
    StoreParams.write(spark, storeDir,
      Map("cellShards" -> cellShards, "vecShards" -> vecShards))
    val subDim = dim / m
    val e = embeddings
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    // persisted BEFORE the overlapped write/collect: the two concurrent
    // actions must observe ONE evaluation of the centroid plan — today
    // centroidsOf is a deterministic filter/select, but if it ever gained
    // sampling, the persisted table and the driver-held centQ the
    // codebooks train on would silently diverge and corrupt the store.
    // The cache pins the single-evaluation invariant instead of relying
    // on determinism (concurrent cache fills of one block serialize in
    // the block manager).
    val cents = Similarity.centroidsOf(e, ivfStride)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisting the centroid table and collecting the driver-held copy
    // are independent actions over the same tiny frame — overlapped
    val (_, centQ) = try graft.core.Par.run2(
      cents.write.mode("overwrite").parquet(centroidsPath(storeDir)),
      cents.collect()
        .map(r => r.getLong(0) ->
          Similarity.quantizeVec(r.getSeq[Double](1).toArray)).toMap)
    finally cents.unpersist(blocking = false)
    // integer residual per vector, staged: codebook training makes
    // `iters`+1 passes over it and encoding one more — staging turns those
    // into parquet re-reads instead of re-running assignment each time.
    // The staging table is full-width (same size class as the raw
    // embeddings), so it is DELETED once encoding finishes — a durable
    // store must hold only the ~64×-smaller codes/ + parameter tables
    val resDir = s"$storeDir/residual_staging"
    Similarity.cellAssignments(e, cents).as[(Long, Array[Double], Long)]
      .map { case (id, v, cell) =>
        (id, ProductQuant.residual(Similarity.quantizeVec(v), centQ(cell)), cell)
      }
      .toDF("vec_id", "vq", "cell")
      .write.mode("overwrite").parquet(resDir)
    val res = spark.read.parquet(resDir)
    val books = ProductQuant.trainCodebooks(res.select("vec_id", "vq"), m,
      subDim, codeStride, iters)
    // the codebook-table write and the encoding pass both depend only on
    // the driver-held `books` (not on each other's files) — overlapped
    graft.core.Par.run2(
      books.zipWithIndex.toSeq
        .flatMap { case (cb, s) => cb.toSeq.map { case (id, cq) => (s, id, cq) } }
        .toDF("s", "code_id", "cq")
        .write.mode("overwrite").parquet(codebooksPath(storeDir)),
      res.as[(Long, Array[Long], Long)]
        .map { case (id, rq, cell) =>
          (id, cell, ProductQuant.encodeIds(books, rq, subDim))
        }
        .toDF("vec_id", "cell", "codes")
        .withColumn("shard", pmod(col("cell"), lit(cellShards.toLong)).cast("int"))
        // one shuffle keyed by shard so each shard leaf gets ONE file per
        // build (not one per upstream task × shard), cell-sorted so probe
        // row-group pruning on `cell` is tight
        .repartition(col("shard"))
        .sortWithinPartitions("cell")
        .write.mode("overwrite").partitionBy("shard").parquet(codesPath(storeDir)))
    // build-time health baseline: per-cell counts + reconstructed-residual
    // energy, the drift reference for [[storeHealth]] — one aggregate over
    // the 64×-compressed codes just written
    cellStats(readCodes(spark, storeDir), books)
      .write.mode("overwrite").parquet(healthPath(storeDir))
    locally {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val rp = Paths.get(resDir)
      if (Files.exists(rp)) {
        Files.walk(rp).iterator().asScala.toSeq.reverseIterator
          .foreach(p => Files.deleteIfExists(p))
      }
    }
  }

  /** Driver-held index parameters read back from the store — bounded by
    * the index hyper-parameters (k centroids, m×k codewords), never the
    * corpus.
    */
  private[graft] def loadCentroids(spark: SparkSession,
      storeDir: String): Array[(Long, Array[Double])] =
    spark.read.parquet(centroidsPath(storeDir))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

  private def loadParams(spark: SparkSession, storeDir: String)
      : (Array[(Long, Array[Double])], ProductQuant.Codebooks) = {
    val centArr = loadCentroids(spark, storeDir)
    val books: ProductQuant.Codebooks = spark.read.parquet(codebooksPath(storeDir))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (_, rows) => rows.map(r => r._2 -> r._3).sortBy(_._1) }
    (centArr, books)
  }

  /** Append a vector batch to an existing store WITHOUT retraining — the
    * daily-ingest path (the ANN sibling of
    * [[IncrementalDedup.appendToStore]]): new vectors are assigned to the
    * existing centroids and encoded against the existing codebooks, and
    * exactly their (vec_id, cell, codes) rows append to `codes/`. The
    * index parameters go slightly stale as the corpus drifts — the
    * standard trade; rebuild cadence is an operational knob, and a probe
    * sees appended vectors immediately either way.
    */
  def appendToStore(embeddings: DataFrame, storeDir: String): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (centArr, books) = loadParams(spark, storeDir)
    val m = books.length
    val centQ: Map[Long, Array[Long]] =
      centArr.map { case (id, cv) => id -> Similarity.quantizeVec(cv) }.toMap
    embeddings
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val cell = Similarity.nearestCentroid(centArr, v)
        val vq = Similarity.quantizeVec(v)
        val rq = ProductQuant.residual(vq, centQ(cell))
        (id, cell, ProductQuant.encodeIds(books, rq, vq.length / m))
      }
      .toDF("vec_id", "cell", "codes")
      .withColumn("shard", pmod(col("cell"),
        lit(cellShardsOf(spark, storeDir).toLong)).cast("int"))
      .write.mode("append").partitionBy("shard").parquet(codesPath(storeDir))
  }

  /** Append raw vectors to the `vectors/` side table (streaming stores'
    * exact-dot probe source), id-sharded so [[deleteFromStore]] can
    * rewrite only `pmod(id, VecShards)` leaves. Normalizes the embedding
    * to ARRAY<DOUBLE> — the corpus fixture stores floats while stream
    * batches carry doubles, and a parquet directory must agree on the
    * element type.
    */
  def appendVectors(embeddings: DataFrame, storeDir: String,
      overwrite: Boolean = false): Unit = {
    val base = embeddings
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("embedding"))
      .withColumn("shard", pmod(col("vec_id"),
        lit(vecShardsOf(embeddings.sparkSession, storeDir).toLong))
        .cast("int"))
    val sized = if (overwrite) base.repartition(col("shard")) else base
    sized.write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("shard").parquet(vectorsPath(storeDir))
  }

  /** Serve a query batch against the persisted index. `queries` are raw
    * double vectors (collected query-side state — bounded by the batch, the
    * request payload a search service holds anyway). The returned plan
    * scans `codes/` only.
    *
    * `nProbe` is the standard IVF recall knob: each query searches its
    * `nProbe` nearest cells (by cosine to the stored centroids — a
    * driver-side ranking over the k-bounded centroid set), recovering
    * neighbors that sit just across a cell boundary at the cost of
    * scanning ~nProbe/nCells of the codes table. The centroid term of the
    * ADC score is per (query, member-cell) — a member's reconstruction is
    * ITS OWN cell's centroid plus its residual, regardless of which probe
    * list matched it.
    */
  def probeStore(spark: SparkSession, storeDir: String,
      queries: Array[(Long, Array[Double])], k: Int = 5,
      nProbe: Int = 1): DataFrame = {
    import spark.implicits._
    val (centArr, books) = loadParams(spark, storeDir)
    val m = books.length
    // code id → position in the id-sorted codebook array, per subspace —
    // lets the scoring pass index straight into the query's dot tables
    val idToIdx: Array[Map[Long, Int]] =
      books.map(cb => cb.iterator.map(_._1).zipWithIndex.toMap)
    val centQ: Map[Long, Array[Long]] =
      centArr.map { case (id, cv) => id -> Similarity.quantizeVec(cv) }.toMap
    // per query: nProbe nearest cells (cosine desc, centroid_id tiebreak —
    // the knnIvfProbe ranking, computed over the driver-held centroid set)
    val qRows: Array[(Long, Array[Long], Array[Long])] = queries.sortBy(_._1)
      .map { case (id, v) =>
        (id, Similarity.quantizeVec(v), rankedCells(centArr, v, nProbe))
      }
    val subDim = qRows.headOption.map(_._2.length / m).getOrElse(0)
    val dtab: Array[Array[Array[Long]]] =
      qRows.map { case (_, vq, _) => ProductQuant.dotTables(books, vq, subDim) }
    // centroid term per (query, member cell): dot(query, that centroid)
    val cterm: Map[(Int, Long), Long] = (for {
      qi <- qRows.indices
      cell <- qRows(qi)._3
    } yield {
      val vq = qRows(qi)._2
      val cq = centQ(cell)
      var d = 0L; var i = 0
      while (i < vq.length) { d += vq(i) * cq(i); i += 1 }
      (qi, cell) -> d
    }).toMap
    val queriesByCell: Map[Long, Array[Int]] = qRows.indices
      .flatMap(qi => qRows(qi)._3.map(_ -> qi))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toArray }
    val wantedCells = queriesByCell.keys.toSeq
    val nCellShards = cellShardsOf(spark, storeDir).toLong
    val wantedShards = wantedCells
      .map(c => java.lang.Math.floorMod(c, nCellShards).toInt).distinct
    val scored = readCodes(spark, storeDir)
      // partition pruning on shard (wanted cells → wanted shards), then
      // the cell predicate reaches the parquet scan — row groups holding
      // only foreign cells are pruned by min/max stats (files are
      // cell-sorted) before any I/O
      .where(col("shard").isin(wantedShards: _*) &&
        col("cell").isin(wantedCells: _*))
      .select("vec_id", "cell", "codes")
      .as[(Long, Long, Array[Long])]
      .flatMap { case (id, cell, codes) =>
        queriesByCell.getOrElse(cell, Array.empty[Int]).iterator
          .filter(qi => qRows(qi)._1 != id)
          .map { qi =>
            var score = cterm((qi, cell)); var s = 0
            while (s < m) { score += dtab(qi)(s)(idToIdx(s)(codes(s))); s += 1 }
            (qRows(qi)._1, id, score)
          }
      }
      .toDF("query_id", "neighbor_id", "score")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** Store maintenance — every streaming append ([[appendToStore]],
    * [[graft.streaming.StreamingAnnDedup]]) adds a file set sized by the
    * micro-batch, so a long-running ingest leaves `codes/` (and the
    * streaming `vectors/` side table) as thousands of tiny parquet files:
    * the classic small-file problem [[graft.sources.Compaction]] exists
    * for. Each present subdir is rewritten to ~`targetBytes` files
    * (shuffle-free coalesce in the merge-down direction) and swapped into
    * place via rename. The swap is not atomic versus a concurrently
    * running probe — run maintenance in the ingest pipeline's quiet
    * window, or front the store with a manifest (out of scope here, the
    * [[graft.streaming.StreamingDedup]] transactional-format boundary).
    * Returns (input files, output files) per compacted subdir.
    *
    * Crash-safe via the retired copy: the swap is rename(dir → dir_old),
    * rename(dir_compacting → dir), delete(dir_old). A crash between the
    * two renames leaves the data in `dir_old` — the next compactStore run
    * detects the orphaned retirement (dir absent, dir_old present) and
    * restores it before compacting, so a re-run self-heals instead of
    * silently skipping the "missing" subdir.
    */
  def compactStore(spark: SparkSession, storeDir: String,
      subdirs: Seq[String] = Seq("codes", "vectors"),
      targetBytes: Long = 128L << 20): Map[String, (Int, Int)] = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    subdirs.flatMap { name =>
      val dir = new Path(s"$storeDir/$name")
      val bak = new Path(s"$storeDir/${name}_old")
      val tmp = new Path(s"$storeDir/${name}_compacting")
      val fs = dir.getFileSystem(conf)
      // recover an interrupted swap: the data survives in the retired copy
      if (!fs.exists(dir) && fs.exists(bak)) {
        fs.delete(tmp, true)
        require(fs.rename(bak, dir), s"could not restore $bak to $dir")
      }
      if (!fs.exists(dir)) None
      else {
        // codes/ and vectors/ are hive-partitioned by shard — compact each
        // leaf into the staged mirror (Compaction.compact refuses nested
        // layouts by design), then swap the whole subdir once
        val leaves = fs.listStatus(dir)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard="))
          .map(_.getPath)
        val counts =
          if (leaves.isEmpty)
            graft.sources.Compaction.compact(spark, dir.toString,
              tmp.toString, targetBytes)
          else
            leaves.map { leaf =>
              graft.sources.Compaction.compact(spark, leaf.toString,
                s"$tmp/${leaf.getName}", targetBytes)
            }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
        fs.delete(bak, true)
        require(fs.rename(dir, bak), s"could not retire $dir")
        require(fs.rename(tmp, dir), s"could not install $tmp")
        fs.delete(bak, true)
        Some(name -> counts)
      }
    }.toMap
  }

  // ------------------------------------------------ delete / health / recluster

  /** Per-cell (n_vecs, sum_energy) over a codes frame: `sum_energy` is the
    * exact integer energy Σ‖reconstructed residual‖² of the cell's members
    * (each member's energy = Σ_s ‖codeword(code_s)‖², a pure lookup into
    * the driver-held codebooks). Build-time this is the [[healthPath]]
    * baseline; probe-time it is [[storeHealth]]'s current side.
    */
  private def cellStats(codes: DataFrame,
      books: ProductQuant.Codebooks): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val energy: Array[Map[Long, Long]] =
      books.map(_.map { case (id, cq) =>
        id -> cq.foldLeft(0L)((a, x) => a + x * x)
      }.toMap)
    codes.select(col("cell"), col("codes")).as[(Long, Array[Long])]
      .map { case (cell, cs) =>
        var e = 0L; var s = 0
        while (s < cs.length) { e += energy(s)(cs(s)); s += 1 }
        (cell, e)
      }
      .toDF("cell", "e")
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), sum(col("e")).as("sum_energy"))
  }

  /** Delete vectors from the persisted store by id — the takedown/GDPR
    * path, fusing the product core's rewrite-the-complement deletion
    * semantics with the derived store: like the deletion kernel it
    * rewrites ONLY affected slices (the partition-rewrite fast path), here
    * the shard leaves that hold a deleted row.
    *
    * Plan shape: one column-pruned pass over `codes/` with the id IN-list
    * pushed finds the affected cells (and hence shards — bounded by
    * CellShards regardless of delete size); each affected `codes/shard=S`
    * leaf is rewritten minus the ids via the staged-retire-install rename
    * discipline of [[compactStore]] (a leaf whose rows are all deleted is
    * removed outright). `vectors/` (when present) needs NO scan to find
    * its slices: it is sharded by `pmod(vec_id, VecShards)`, so the
    * affected leaves are a pure function of the id list.
    *
    * Centroids, codebooks and the health baseline are deliberately NOT
    * touched: index parameters keep the deleted vectors' training
    * influence (the same staleness contract as [[appendToStore]]), and
    * [[storeHealth]] exists to expose exactly that drift;
    * [[reclusterStore]] is the repair. Idempotent — re-running the same
    * delete (the crash-heal path) finds nothing left to rewrite.
    */
  def deleteFromStore(spark: SparkSession, storeDir: String,
      ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val affShards = readCodes(spark, storeDir)
      .where(col("vec_id").isin(ids: _*))
      .select("shard").distinct()
      .collect().map(_.getInt(0)).toSeq
    rewriteShardLeaves(spark, codesPath(storeDir), affShards, "vec_id", ids,
      sortCols = Seq("cell"))
    val vecs = new Path(vectorsPath(storeDir))
    if (vecs.getFileSystem(conf).exists(vecs)) {
      val nVecShards = vecShardsOf(spark, storeDir).toLong
      val vShards = ids
        .map(i => java.lang.Math.floorMod(i, nVecShards).toInt).distinct
      rewriteShardLeaves(spark, vectorsPath(storeDir), vShards, "vec_id", ids)
    }
  }

  /** Rewrite the named `shard=S` leaves of a sharded parquet table,
    * dropping rows whose `keyCol` is in `ids`. ALL affected leaves are
    * staged by ONE Spark job — a multi-path scan (basePath keeps the
    * `shard` partition column), an id anti-filter, and a
    * shard-partitioned write OUTSIDE the table root (a staging dir inside
    * it would poison partition-value inference) — then installed per leaf
    * via retire-install renames. The earlier one-job-per-leaf loop made a
    * uniformly-spread takedown (every shard affected) pay shard-count ×
    * job-overhead sequentially: 13 s for the BM25 surface entry at
    * sf0.1; batching it is the fix, and on a real cluster it is also the
    * only shape that engages more than one executor at a time.
    *
    * `sortCols` re-establishes the leaf's row-group clustering (postings
    * term-sorted, codes cell-sorted) so probe-time min/max pruning is as
    * tight after a delete as after a build. The id filter switches from an
    * IN-list expression to a broadcast anti-join past [[IdFilterMax]] ids
    * — a million-literal expression tree would be slower to analyze than
    * to execute.
    *
    * Crash contract unchanged from the per-leaf version: staging is
    * written before any live leaf moves; a crash between a leaf's two
    * renames leaves its data in the retired copy, and the next call
    * (re-running the delete heals) restores it first — the
    * [[compactStore]] recovery contract. A leaf whose rows are all
    * deleted is removed outright. Idempotent: already-rewritten leaves
    * re-filter to themselves.
    */
  private[pipeline] def rewriteShardLeaves(spark: SparkSession, tableDir: String,
      shards: Seq[Int], keyCol: String, ids: Seq[Long],
      sortCols: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    if (shards.isEmpty) return
    val fs = new Path(tableDir).getFileSystem(conf)
    shards.foreach { s =>
      val live = new Path(s"$tableDir/shard=$s")
      val bak = new Path(s"${tableDir}_rwold_shard_$s")
      if (!fs.exists(live) && fs.exists(bak))
        require(fs.rename(bak, live), s"could not restore $bak to $live")
    }
    val liveShards = shards
      .filter(s => fs.exists(new Path(s"$tableDir/shard=$s")))
    if (liveShards.isEmpty) return
    val staging = s"${tableDir}_rw_staging"
    fs.delete(new Path(staging), true)
    val scan = spark.read.option("basePath", tableDir)
      .parquet(liveShards.map(s => s"$tableDir/shard=$s"): _*)
    val kept =
      if (ids.length <= IdFilterMax) scan.where(!col(keyCol).isin(ids: _*))
      else {
        val idDf = spark.createDataset(ids)(
          org.apache.spark.sql.Encoders.scalaLong).toDF(keyCol)
        scan.join(org.apache.spark.sql.functions.broadcast(idDf),
          Seq(keyCol), "left_anti")
      }
    val clustered = kept.repartition(liveShards.size, col("shard"))
    (if (sortCols.nonEmpty)
       clustered.sortWithinPartitions(sortCols.map(col): _*)
     else clustered)
      .write.mode("overwrite").partitionBy("shard").parquet(staging)
    liveShards.foreach { s =>
      val live = new Path(s"$tableDir/shard=$s")
      val staged = new Path(s"$staging/shard=$s")
      val bak = new Path(s"${tableDir}_rwold_shard_$s")
      fs.delete(bak, true)
      require(fs.rename(live, bak), s"could not retire $live")
      if (fs.exists(staged))
        require(fs.rename(staged, live), s"could not install $staged")
      // else: every row deleted — the leaf goes away
      fs.delete(bak, true)
    }
    fs.delete(new Path(staging), true)
  }

  /** Above this many delete ids the leaf-rewrite filter becomes a
    * broadcast anti-join instead of a literal IN-list expression. */
  private[pipeline] val IdFilterMax = 10000

  /** Drift report: per-cell counts and reconstructed-residual energy, NOW
    * vs the build-time [[healthPath]] baseline — the cheap audit that
    * makes [[appendToStore]]/[[deleteFromStore]] parameter staleness
    * visible instead of silently decaying recall. Cells that emptied
    * since build show n_now = 0; cells born after build (an append landing
    * in a cell that had no members) show n_build = 0. When counts skew or
    * energy drifts, [[reclusterStore]] is the repair.
    */
  def storeHealth(spark: SparkSession, storeDir: String): DataFrame = {
    val (_, books) = loadParams(spark, storeDir)
    val cur = cellStats(readCodes(spark, storeDir), books)
      .select(col("cell"), col("n_vecs").as("n_now"),
        col("sum_energy").as("e_now"))
    val base = spark.read.parquet(healthPath(storeDir))
      .select(col("cell"), col("n_vecs").as("n_build"),
        col("sum_energy").as("e_build"))
    base.join(cur, Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("n_build"), lit(0L)).as("n_build"),
        coalesce(col("e_build"), lit(0L)).as("e_build"),
        coalesce(col("n_now"), lit(0L)).as("n_now"),
        coalesce(col("e_now"), lit(0L)).as("e_now"))
      .orderBy("cell")
  }

  /** Retrain the index over the CURRENT corpus and swap it in — the
    * repair for months of append/delete parameter drift. One
    * [[buildStore]] into a staging store, then the centroids/codebooks/
    * codes/health subdirs swap via the retire-install rename discipline;
    * `vectors/` is untouched (id-sharded — independent of cell geometry
    * by design). Probes after recluster are bit-identical to a fresh
    * [[buildStore]] over the same corpus (spec-pinned). Holds the store
    * `_LOCK` for the whole retrain+swap ([[Locking.withStoreLock]]):
    * two racing reclusters would clobber the shared staging dir and
    * interleave the subdir swaps.
    */
  def reclusterStore(embeddings: DataFrame, storeDir: String,
      ivfStride: Int = 50, m: Int = 16, codeStride: Int = 40,
      iters: Int = 2, dim: Int = 64): Unit =
    Locking.withStoreLock(embeddings.sparkSession, storeDir) {
      reclusterStoreLocked(embeddings, storeDir, ivfStride, m, codeStride,
        iters, dim)
    }

  private def reclusterStoreLocked(embeddings: DataFrame, storeDir: String,
      ivfStride: Int, m: Int, codeStride: Int, iters: Int, dim: Int): Unit = {
    val spark = embeddings.sparkSession
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val staging = s"${storeDir}_recluster"
    val stagingPath = new Path(staging)
    val fs = stagingPath.getFileSystem(conf)
    fs.delete(stagingPath, true)
    buildStore(embeddings, staging, ivfStride, m, codeStride, iters, dim,
      cellShards = cellShardsOf(spark, storeDir),
      vecShards = vecShardsOf(spark, storeDir))
    Seq("centroids", "codebooks", "codes", "health",
        "_store_params.tsv").foreach { name =>
      val live = new Path(s"$storeDir/$name")
      val fresh = new Path(s"$staging/$name")
      val bak = new Path(s"$storeDir/${name}_reclold")
      fs.delete(bak, true)
      if (fs.exists(live)) require(fs.rename(live, bak), s"could not retire $live")
      require(fs.rename(fresh, live), s"could not install $fresh")
      fs.delete(bak, true)
    }
    fs.delete(stagingPath, true)
  }

  /** Surface query for [[deleteFromStore]]: build the store from the full
    * corpus, delete every `vec_id % 17 = 3` vector, probe. Equals (oracle:
    * [[ProductQuant.knnIvfPqSql]] with the same delete predicate) an index
    * whose centroids and codebooks were trained on the FULL corpus — the
    * delete-in-place staleness contract — but whose codes contain only the
    * surviving vectors.
    */
  def annStoreDelete(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val storeDir = Stores.temp("graft-ann-del")
    val e = Tables.embeddings(spark, sfDir)
    // the two id/query collects read only the base table — independent
    // of the store build, so all three overlap (guide §2.6)
    val r = graft.core.Par.run[Any](Seq(
      () => buildStore(e, storeDir),
      () => e.where(col("vec_id") % 17 === 3)
        .select("vec_id").collect().map(_.getLong(0)).toSeq,
      () => e.where(col("vec_id") < nQueries)
        .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
        .collect()
        .map(rw => rw.getLong(0) -> rw.getSeq[Double](1).toArray)))
    val ids = r(1).asInstanceOf[Seq[Long]]
    val queries = r(2).asInstanceOf[Array[(Long, Array[Double])]]
    deleteFromStore(spark, storeDir, ids)
    probeStore(spark, storeDir, queries, k)
  }

  /** Surface query for [[storeHealth]]: build, delete the `vec_id % 17 = 3`
    * slice, report per-cell drift. Non-vacuous by construction — the
    * deleted slice spans many cells, so n_now < n_build on every affected
    * row while untouched cells prove the baseline intact.
    */
  def annStoreHealth(spark: SparkSession, sfDir: String): DataFrame = {
    val storeDir = Stores.temp("graft-ann-health")
    val e = Tables.embeddings(spark, sfDir)
    // id collect reads only the base table — overlaps the build
    val (_, ids) = graft.core.Par.run2(
      buildStore(e, storeDir),
      e.where(col("vec_id") % 17 === 3)
        .select("vec_id").collect().map(_.getLong(0)).toSeq)
    deleteFromStore(spark, storeDir, ids)
    storeHealth(spark, storeDir)
  }

  /** DuckDB oracle for [[annStoreHealth]] — the shared IVF-PQ build chain
    * ([[ProductQuant.knnIvfPqBuildCtes]]) up to the per-vector codes, then
    * per-cell count + codeword-energy aggregates twice: over all vectors
    * (the build baseline) and over the survivors of the delete predicate
    * (the current store).
    */
  def annStoreHealthSql(deletePred: String = "vec_id % 17 = 3",
      ivfStride: Int = 50, m: Int = 16, codeStride: Int = 40,
      iters: Int = 2, dim: Int = 64): String =
    s"""${ProductQuant.knnIvfPqBuildCtes(ivfStride, m, codeStride, iters, dim, None)},
       |cw AS (SELECT s, code_id,
       |  CAST(list_sum(list_transform(cq, x -> x * x)) AS BIGINT) AS e
       |  FROM c$iters),
       |venergy AS (
       |  SELECT codes.vec_id, codes.cell, CAST(sum(cw.e) AS BIGINT) AS e
       |  FROM codes JOIN cw ON codes.s = cw.s AND codes.code = cw.code_id
       |  GROUP BY codes.vec_id, codes.cell),
       |build AS (SELECT cell, count(*) AS n_build,
       |            CAST(sum(e) AS BIGINT) AS e_build
       |          FROM venergy GROUP BY cell),
       |now_ AS (SELECT cell, count(*) AS n_now, CAST(sum(e) AS BIGINT) AS e_now
       |         FROM venergy WHERE NOT ($deletePred) GROUP BY cell)
       |SELECT cell, n_build, e_build,
       |  CAST(coalesce(n_now, 0) AS BIGINT) AS n_now,
       |  CAST(coalesce(e_now, 0) AS BIGINT) AS e_now
       |FROM build LEFT JOIN now_ USING (cell) ORDER BY cell""".stripMargin

  /** Distributed ingest-time probe — the batch-as-queries form of
    * [[probeStore]]: an ingestion pipeline's micro-batch IS the query side
    * and can be arbitrarily large, so nothing batch-sized may touch the
    * driver. Matches are (new vector, corpus vector) pairs whose EXACT
    * integer dot (of the [[Similarity.quantizeVec]] forms; ≈ 10⁶ × cosine
    * on unit vectors) clears `minScore`, searched IVF-style: only pairs
    * sharing a coarse cell are scored — the standard ingest-dedup gate
    * (recall bounded by cell assignment, like every IVF probe; the nProbe
    * widening of [[probeStore]] applies the same way if needed).
    *
    * Plan shape: the batch is cell-assigned in a shuffle-free typed map
    * over the driver-held centroids; the batch's distinct cells are a
    * k-bounded set, so the codes scan carries a pushed `cell` IN-list and
    * yields candidate ids ONLY; raw corpus vectors are re-joined by id for
    * exactly those candidates ([[refineProbe]]'s discipline: pair shuffles
    * carry ids, vector payloads join once by key); one cell-keyed join
    * scores Σ_cell |batch∩cell|·|corpus∩cell| pairs — the IVF contract.
    *
    * The `new_vec_id <> corpus_vec_id` guard is the replay shield: a
    * micro-batch re-run after its store append (crash before the stream
    * commit) finds its own vectors at cosine 1.0 under the same ids and
    * must not quarantine them ([[IncrementalDedup]]'s self-match rule).
    */
  def matchStore(spark: SparkSession, storeDir: String,
      corpusEmbeddings: DataFrame, batch: DataFrame,
      minScore: Long = 800000L, nProbe: Int = 1,
      centroids: Option[Array[(Long, Array[Double])]] = None,
      blocks: Int = 8): DataFrame = {
    import spark.implicits._
    val centArr = centroids.getOrElse(loadCentroids(spark, storeDir))
    val assigned = batchAssignments(spark, batch, centArr, nProbe)
    val wantedCells = assigned.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val wantedShards = wantedCells
      .map(c => java.lang.Math.floorMod(c,
        cellShardsOf(spark, storeDir).toLong).toInt).distinct
    val candidates = readCodes(spark, storeDir)
      .where(col("shard").isin(wantedShards: _*) &&
        col("cell").isin(wantedCells: _*))
      .select(col("vec_id").as("corpus_vec_id"), col("cell"))
    // candidates quantized ONCE here — inside the pair map each corpus
    // vector would re-quantize per matching batch vector, i.e. per pair.
    // The corpus side also takes an id-hash BLOCK key ([[SemanticDedup]]'s
    // skew scheme, two-sided form): a pathological cell (a near-identical
    // cluster) splits over `blocks` reducers instead of landing whole on
    // one task — a plan property only, the pair set is unchanged
    val corpusVecs = corpusEmbeddings
      .select(col("vec_id").as("corpus_vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("cv"))
      .join(candidates, "corpus_vec_id")
      .select(col("corpus_vec_id"), col("cv"), col("cell"))
      .as[(Long, Array[Double], Long)]
      .map { case (cid, cv, cell) =>
        // floorMod: external ids are not validated anywhere, and a plain %
        // on a negative id yields a negative block the fanned side
        // (0..blocks-1) would never join — silently dropping its matches
        (cid, Similarity.quantizeVec(cv), cell, java.lang.Math.floorMod(cid, blocks.toLong).toInt)
      }
      .toDF("corpus_vec_id", "cvq", "cell", "blk")
    // the (small) batch side fans out to every block, so (cell, blk) is
    // the real equi-key reaching the shuffle
    val fanned = assigned
      .withColumn("blk", explode(sequence(lit(0), lit(blocks - 1))))
    fanned.join(corpusVecs, Seq("cell", "blk"))
      .where(col("vec_id") =!= col("corpus_vec_id"))
      .select(col("vec_id"), col("corpus_vec_id"), col("bvq"), col("cvq"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (nid, cid, bvq, cvq) => (nid, cid, dotQ(bvq, cvq)) }
      .toDF("new_vec_id", "corpus_vec_id", "score")
      .where(col("score") >= minScore)
      .orderBy("new_vec_id", "corpus_vec_id")
  }

  /** Intra-batch matches — [[matchStore]] is blind to two near-dups
    * arriving in the same micro-batch, so the batch also probes itself:
    * same-cell pairs with `id_a < id_b`, the LOWER id canonical and the
    * higher quarantined (the [[IncrementalDedup.selfProbe]] rule). Same
    * scale shape as the store probe minus the codes scan.
    */
  def selfMatches(spark: SparkSession, storeDir: String, batch: DataFrame,
      minScore: Long = 800000L,
      centroids: Option[Array[(Long, Array[Double])]] = None,
      blocks: Int = 8): DataFrame = {
    import spark.implicits._
    val centArr = centroids.getOrElse(loadCentroids(spark, storeDir))
    val a = batchAssignments(spark, batch, centArr)
    // same two-sided block scheme as [[matchStore]]: one side carries an
    // id-hash block key, the other fans to every block, so (cell, blk) is
    // the equi-key and an all-near-identical batch still spreads its
    // quadratic over `blocks` reducers; the id_a < id_b guard keeps each
    // unordered pair exactly once (the blocked side's row has ONE blk)
    // pmod, not %: a negative vec_id's block must land in [0, blocks)
    // or the fanned side would never join it (see matchStore)
    val blocked = a
      .withColumn("blk", pmod(col("vec_id"), lit(blocks.toLong)).cast("int"))
    val fanned = a
      .withColumn("blk", explode(sequence(lit(0), lit(blocks - 1))))
    fanned.as("x").join(blocked.as("y"),
        col("x.cell") === col("y.cell") && col("x.blk") === col("y.blk") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("y.vec_id"), col("x.vec_id").as("corpus_vec_id"),
        col("y.bvq"), col("x.bvq").as("avq"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (nid, cid, nvq, cvq) => (nid, cid, dotQ(nvq, cvq)) }
      .toDF("new_vec_id", "corpus_vec_id", "score")
      .where(col("score") >= minScore)
      .orderBy("new_vec_id", "corpus_vec_id")
  }

  /** Shuffle-free (vec_id, bvq, cell) cell assignment of a vector batch
    * against the driver-held store centroids. `nProbe` > 1 fans each BATCH
    * vector out to its nProbe nearest cells (the [[probeStore]] recall
    * knob — a near-dup sitting just across a cell boundary is recovered at
    * the cost of nProbe× batch-side join rows; corpus vectors stay
    * single-cell, so no pair is generated twice).
    */
  private def batchAssignments(spark: SparkSession, batch: DataFrame,
      centArr: Array[(Long, Array[Double])], nProbe: Int = 1): DataFrame = {
    import spark.implicits._
    batch
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        val vq = Similarity.quantizeVec(v)
        rankedCells(centArr, v, nProbe).iterator.map(cell => (id, vq, cell))
      }
      .toDF("vec_id", "bvq", "cell")
  }

  /** The nProbe nearest cells of `v`, ranked with EXACTLY the
    * [[Similarity.nearestCentroid]] comparator (cosine desc by
    * java.lang.Double.compare, centroid id asc) so nProbe = 1 reproduces
    * the build-time assignment bit-for-bit.
    */
  private def rankedCells(centArr: Array[(Long, Array[Double])],
      v: Array[Double], nProbe: Int): Array[Long] =
    centArr
      .filter(_._2.length == v.length)
      .map { case (cid, cv) => (cid, Similarity.cosJvm(cv, v)) }
      .sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._2, b._2)
        c > 0 || (c == 0 && a._1 < b._1)
      }
      .take(nProbe).map(_._1)

  private def dotQ(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < a.length) { d += a(i) * b(i); i += 1 }
    d
  }

  /** Surface query for [[matchStore]]: the store is built from the corpus,
    * and the incoming "batch" is the deterministic planted-near-dup slice
    * ([[Similarity.plantNearDups]]'s offset-id rows — the same fixture
    * that makes `dedup_embedding_ann` non-vacuous), so every planted
    * vector must match its original (cosine ≈ 0.997 ⇒ score ≈ 997000).
    */
  def annIngestMatches(spark: SparkSession, sfDir: String,
      minScore: Long = 800000L, stride: Int = 97,
      idOffset: Long = 10000000L): DataFrame = {
    val storeDir = Stores.temp("graft-ann-ingest")
    val corpus = Tables.embeddings(spark, sfDir)
    buildStore(corpus, storeDir)
    val batch = Similarity.plantNearDups(corpus, stride = stride,
      idOffset = idOffset).where(col("vec_id") >= idOffset)
    matchStore(spark, storeDir, corpus, batch, minScore)
  }

  /** DuckDB oracle for [[annIngestMatches]] — same stride centroids, same
    * argmax-cosine cell assignment on both sides (the `assign` ranking of
    * [[ProductQuant.knnIvfPqSql]], which the store's codes/ provably
    * reproduces), same planted batch, same exact integer dot and floor.
    */
  def annIngestMatchesSql(minScore: Long = 800000L, ivfStride: Int = 50,
      dim: Int = 64, stride: Int = 97, idOffset: Long = 10000000L,
      bump: Double = 0.08): String =
    s"""WITH ${Similarity.plantNearDupsCte(stride, idOffset, bump)},
       |e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS vq
       |  FROM embeddings),
       |cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e
       |         WHERE vec_id % $ivfStride = 0),
       |corpus AS (
       |  SELECT vec_id AS corpus_vec_id, vq AS cvq, centroid_id AS cell,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY list_cosine_similarity(cent.cv, e.v) DESC, centroid_id) AS crank
       |  FROM e CROSS JOIN cent),
       |b AS (
       |  SELECT vec_id, embedding AS v,
       |    list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS bvq
       |  FROM embeddings_aug WHERE vec_id >= $idOffset),
       |batch AS (
       |  SELECT b.vec_id AS new_vec_id, bvq, centroid_id AS cell,
       |    row_number() OVER (PARTITION BY b.vec_id
       |      ORDER BY list_cosine_similarity(cent.cv, b.v) DESC, centroid_id) AS crank
       |  FROM b CROSS JOIN cent),
       |scored AS (
       |  SELECT new_vec_id, corpus_vec_id,
       |    CAST(list_sum(list_transform(generate_series(1, $dim),
       |      i -> bvq[i] * cvq[i])) AS BIGINT) AS score
       |  FROM (SELECT * FROM batch WHERE crank = 1) bb
       |  JOIN (SELECT * FROM corpus WHERE crank = 1) cc USING (cell)
       |  WHERE new_vec_id <> corpus_vec_id)
       |SELECT new_vec_id, corpus_vec_id, score FROM scored
       |WHERE score >= $minScore ORDER BY new_vec_id, corpus_vec_id""".stripMargin

  /** Two-stage search — ADC shortlist, exact re-rank: the standard
    * accuracy recovery for any quantized index (FAISS's refine/rerank
    * stage). Stage 1 probes the store for a `shortlistK`-deep candidate
    * list per query (PQ-approximate scores). Stage 2 rescores exactly
    * those candidates with the EXACT integer dot product of the two
    * quantized raw vectors and keeps the top `k` — PQ quantization error
    * then affects only which candidates made the shortlist, never their
    * final order.
    *
    * Scale shape: the shortlist is queries × shortlistK pairs — bounded by
    * request parameters, so collecting it to the driver is legitimate
    * (the centroid pattern). The refine pass reads raw embeddings ONLY for
    * the shortlisted vector ids: the `vec_id` IN-list reaches the parquet
    * scan (PushedFilters), so row-group stats skip everything else — the
    * point lookups a vector store serves from its id-keyed layout. No
    * shuffle anywhere in the refine stage; the re-rank window runs over
    * queries × shortlistK rows.
    */
  def refineProbe(spark: SparkSession, storeDir: String, embeddings: DataFrame,
      queries: Array[(Long, Array[Double])], k: Int = 5, shortlistK: Int = 20,
      nProbe: Int = 1): DataFrame = {
    import spark.implicits._
    val shortlist: Array[(Long, Long)] =
      probeStore(spark, storeDir, queries, shortlistK, nProbe)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    val qvq: Map[Long, Array[Long]] =
      queries.map { case (id, v) => id -> Similarity.quantizeVec(v) }.toMap
    val byNeighbor: Map[Long, Array[Long]] =
      shortlist.groupBy(_._2).map { case (n, xs) => n -> xs.map(_._1) }
    val ids = byNeighbor.keys.toSeq.sorted
    val exact = embeddings
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .where(col("vec_id").isin(ids: _*))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        val nvq = Similarity.quantizeVec(v)
        byNeighbor(id).iterator.map { qid =>
          val q = qvq(qid)
          var d = 0L; var i = 0
          while (i < nvq.length) { d += q(i) * nvq(i); i += 1 }
          (qid, id, d)
        }
      }
      .toDF("query_id", "neighbor_id", "score")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** Surface query for [[refineProbe]]: build the store, shortlist, exact
    * re-rank. Oracle: [[ProductQuant.knnIvfPqRefineSql]] (the shared ADC
    * CTE chain + the same exact-dot refine).
    */
  def knnIvfPqRefine(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, shortlistK: Int = 20,
      nProbe: Int = 1): DataFrame = {
    val storeDir = Stores.temp("graft-ann-refine")
    val embeddings = Tables.embeddings(spark, sfDir)
    // query collect reads only the base table — overlaps the build
    val (_, queries) = graft.core.Par.run2(
      buildStore(embeddings, storeDir),
      embeddings
        .where(col("vec_id") < nQueries)
        .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray))
    refineProbe(spark, storeDir, embeddings, queries, k, shortlistK, nProbe)
  }

  /** Surface query: build the store in a fresh temp dir, then probe it with
    * the standard `vec_id < nQueries` query batch. Build cost is part of
    * the measured entry (as with `dedup_incremental`); a production
    * deployment pays it once and then only ever runs [[probeStore]].
    * Result is bit-identical to [[ProductQuant.knnIvfPq]], so the entry
    * shares [[ProductQuant.knnIvfPqSql]] as its oracle.
    */
  def knnIvfPqStore(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, ivfStride: Int = 50, m: Int = 16,
      codeStride: Int = 40, iters: Int = 2, dim: Int = 64,
      nProbe: Int = 1): DataFrame = {
    val storeDir = Stores.temp("graft-ann-store")
    val embeddings = Tables.embeddings(spark, sfDir)
    // query collect reads only the base table — overlaps the build
    val (_, queries) = graft.core.Par.run2(
      buildStore(embeddings, storeDir, ivfStride, m, codeStride, iters, dim),
      embeddings
        .where(col("vec_id") < nQueries)
        .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray))
    probeStore(spark, storeDir, queries, k, nProbe)
  }

  /** Recall@k of the persisted store's probe at TWO operating points —
    * the quantified side of the nProbe recall/latency trade
    * ([[ProductQuant.annRecall]]'s audit extended to the knob a deployment
    * actually turns): ONE store build, the probe run at `nProbeLo` and
    * `nProbeHi`, both intersected with exact brute-force cosine. Output
    * per query: (hits_lo, recall_lo, hits_hi, recall_hi); widening the
    * probe list can only add candidate cells, so recall_hi dominates
    * recall_lo row by row (the probe-dominance spec pins the containment,
    * this entry pins the measured values).
    *
    * Scale shape: one parameter-bounded build + two ~nProbe/nCells probes
    * + one brute-force scan; the joins are k-rows-per-query.
    */
  def annRecallNprobe(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, nProbeLo: Int = 1,
      nProbeHi: Int = 2): DataFrame = {
    val storeDir = Stores.temp("graft-ann-recall")
    val embeddings = Tables.embeddings(spark, sfDir)
    // query collect reads only the base table — overlaps the build
    val (_, queries) = graft.core.Par.run2(
      buildStore(embeddings, storeDir),
      embeddings
        .where(col("vec_id") < nQueries)
        .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray))
    val exact = Similarity.knnBruteForce(spark, sfDir, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    def hitsAt(nProbe: Int, name: String): DataFrame =
      probeStore(spark, storeDir, queries, k, nProbe)
        .select(col("query_id"), col("neighbor_id"))
        .withColumn(name, lit(1L))
    exact
      .join(hitsAt(nProbeLo, "h_lo"), Seq("query_id", "neighbor_id"), "left")
      .join(hitsAt(nProbeHi, "h_hi"), Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(coalesce(sum(col("h_lo")), lit(0L)).cast("long").as("hits_lo"),
        coalesce(sum(col("h_hi")), lit(0L)).cast("long").as("hits_hi"))
      .withColumn("recall_lo", round(col("hits_lo") / lit(k.toDouble), 4))
      .withColumn("recall_hi", round(col("hits_hi") / lit(k.toDouble), 4))
      .select("query_id", "hits_lo", "recall_lo", "hits_hi", "recall_hi")
      .orderBy("query_id")
  }

  /** DuckDB oracle for [[annRecallNprobe]] — brute force joined against
    * the shared IVF-PQ chain instantiated at both probe widths; all three
    * legs are already-gated oracles, so the recall arithmetic cannot
    * drift from any of them.
    */
  def annRecallNprobeSql(nQueries: Int = 10, k: Int = 5, nProbeLo: Int = 1,
      nProbeHi: Int = 2): String =
    s"""WITH exact_k AS (FROM (${Similarity.knnBruteForceSql(nQueries, k)})),
       |lo_k AS (FROM (${ProductQuant.knnIvfPqSql(nQueries, k, nProbe = nProbeLo)})),
       |hi_k AS (FROM (${ProductQuant.knnIvfPqSql(nQueries, k, nProbe = nProbeHi)}))
       |SELECT e.query_id,
       |  CAST(count(l.neighbor_id) AS BIGINT) AS hits_lo,
       |  round(count(l.neighbor_id) * 1.0 / $k, 4) AS recall_lo,
       |  CAST(count(h.neighbor_id) AS BIGINT) AS hits_hi,
       |  round(count(h.neighbor_id) * 1.0 / $k, 4) AS recall_hi
       |FROM exact_k e
       |LEFT JOIN lo_k l ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
       |LEFT JOIN hi_k h ON e.query_id = h.query_id AND e.neighbor_id = h.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin
}

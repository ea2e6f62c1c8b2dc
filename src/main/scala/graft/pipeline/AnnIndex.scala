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
  *   - `codes/`     — (vec_id, cell, codes ARRAY<BIGINT>): one row per
  *     corpus vector — its IVF cell plus the m PQ code ids of its residual.
  *     This is the ONLY corpus-sized table, and the only one a probe scans:
  *     the FAISS IVFPQ storage model (cell id + m codes per vector; at
  *     100 TB of raw embeddings the codes table is ~64× smaller and is what
  *     keeps the whole index scannable per query).
  *
  * A probe's distributed work is one pass over `codes/` filtered to the
  * query cells (the `cell` predicate reaches the parquet scan, so row-group
  * stats prune foreign cells) doing m table lookups per vector — no
  * training job, no embeddings scan, nothing corpus-sized collected. The
  * plan spec pins all three properties.
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

  /** Train and persist the IVF-PQ index from a (vec_id, embedding) frame.
    * One heavy pass assigns cells + residuals (staged so codebook training
    * and encoding don't recompute it), `iters` integer Lloyd rounds train
    * the codebooks, one staged pass encodes every vector to its m code ids.
    */
  def buildStore(embeddings: DataFrame, storeDir: String,
      ivfStride: Int = 50, m: Int = 16, codeStride: Int = 40,
      iters: Int = 2, dim: Int = 64): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val e = embeddings
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val cents = Similarity.centroidsOf(e, ivfStride)
    cents.write.mode("overwrite").parquet(centroidsPath(storeDir))
    val centQ: Map[Long, Array[Long]] = cents.collect()
      .map(r => r.getLong(0) ->
        Similarity.quantizeVec(r.getSeq[Double](1).toArray)).toMap
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
    books.zipWithIndex.toSeq
      .flatMap { case (cb, s) => cb.toSeq.map { case (id, cq) => (s, id, cq) } }
      .toDF("s", "code_id", "cq")
      .write.mode("overwrite").parquet(codebooksPath(storeDir))
    res.as[(Long, Array[Long], Long)]
      .map { case (id, rq, cell) =>
        (id, cell, ProductQuant.encodeIds(books, rq, subDim))
      }
      .toDF("vec_id", "cell", "codes")
      .write.mode("overwrite").parquet(codesPath(storeDir))
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
  private def loadParams(spark: SparkSession, storeDir: String)
      : (Array[(Long, Array[Double])], ProductQuant.Codebooks) = {
    val centArr = spark.read.parquet(centroidsPath(storeDir))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
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
      .write.mode("append").parquet(codesPath(storeDir))
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
        // rank with EXACTLY the nearestCentroid comparator (cosine desc by
        // java.lang.Double.compare — NaN greatest, like the oracle's
        // max_by struct ordering — then centroid id asc), so nProbe=1
        // reproduces the build-time assignment bit-for-bit
        val ranked = centArr
          .filter(_._2.length == v.length)
          .map { case (cid, cv) => (cid, Similarity.cosJvm(cv, v)) }
          .sortWith { (a, b) =>
            val c = java.lang.Double.compare(a._2, b._2)
            c > 0 || (c == 0 && a._1 < b._1)
          }
          .take(nProbe).map(_._1)
        (id, Similarity.quantizeVec(v), ranked)
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
    val scored = spark.read.parquet(codesPath(storeDir))
      // the cell predicate reaches the parquet scan — row groups holding
      // only foreign cells are pruned by min/max stats before any I/O
      .where(col("cell").isin(wantedCells: _*))
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
    buildStore(embeddings, storeDir)
    val queries = embeddings
      .where(col("vec_id") < nQueries)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
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
    buildStore(embeddings, storeDir, ivfStride, m, codeStride, iters, dim)
    val queries = embeddings
      .where(col("vec_id") < nQueries)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    probeStore(spark, storeDir, queries, k, nProbe)
  }
}

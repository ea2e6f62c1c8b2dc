package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product quantization (PQ) ANN — the memory-side companion of
  * [[Quantization]]: where int8 cuts a vector 4×, PQ cuts it to `m` code
  * bytes (64 dims × 4 B → 4 codes here, 64×), which is what lets a
  * 100 TB embedding corpus keep its ENTIRE index resident in cluster
  * memory. Search is the standard asymmetric-distance computation (ADC):
  * the query precomputes one inner-product table per (subspace, codeword)
  * and every document is scored by `m` table lookups instead of a
  * 64-dim float loop. This operator is the exhaustive-ADC building block;
  * composing it behind [[Similarity.knnIvfTrained]]'s cells gives the
  * classical IVF-PQ layout.
  *
  * Determinism: training reuses the exact-integer Lloyd scheme of
  * [[Similarity.trainedCentroidsOf]] — vectors quantized to
  * `round(x*1000)`, per-subspace codeword assignment by INTEGER squared
  * L2 (tiebreak min codeword id), centroid update `floor(sum/count)` —
  * and ADC scores are integer dot products, so every value in the report
  * is exact 64-bit arithmetic mirrored bit-for-bit by the DuckDB oracle
  * (no float summation-order or rounding hazards anywhere).
  *
  * Scale shape: codebooks are m × k × subDim — bounded by the PQ
  * parameters, never the corpus — and live on the driver (the MLlib
  * k-means shape). Each Lloyd round is one job: a typed flatMap emits
  * (subspace, cell, subvector), map-side partial aggregation reduces to
  * cells × dims rows, and only that tiny frame is shuffled/collected.
  * Encode + score is a single corpus pass closing over the codebooks and
  * the query distance tables; the only corpus-sized exchange in the final
  * plan is the ids+score shuffle feeding the per-query top-k window
  * (WindowGroupLimit prunes it map-side).
  *
  * The test corpus is unit-norm (verified in the spec), so inner-product
  * order equals cosine order and recall is gated directly against
  * [[Similarity.knnBruteForce]].
  */
object ProductQuant {

  /** Per-subspace codebooks, driver-held: `codebooks(s)` is the sorted
    * (codewordId, quantizedSubvector) array for subspace `s`.
    */
  type Codebooks = Array[Array[(Long, Array[Long])]]

  private[pipeline] def slice(vq: Array[Long], s: Int, subDim: Int): Array[Long] = {
    val out = new Array[Long](subDim)
    System.arraycopy(vq, s * subDim, out, 0, subDim)
    out
  }

  /** Index (into the sorted codebook array) of the codeword with minimum
    * integer squared L2 distance; ties break to the smaller codeword id,
    * which is the smaller index because the array is id-sorted — the JVM
    * mirror of the oracle's `ORDER BY dist ASC, code_id`.
    */
  private[pipeline] def nearestCodeIdx(codebook: Array[(Long, Array[Long])],
      svq: Array[Long]): Int = {
    var bestIdx = 0; var best = Long.MaxValue
    var c = 0
    while (c < codebook.length) {
      val cq = codebook(c)._2
      var d = 0L; var i = 0
      while (i < svq.length) { val e = svq(i) - cq(i); d += e * e; i += 1 }
      if (d < best) { best = d; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  /** Integer residual vector − centroid — THE one definition shared by
    * the one-shot IVF-PQ, the store build, and the store append, so the
    * store's bit-identity with [[knnIvfPq]] can't drift.
    */
  private[pipeline] def residual(vq: Array[Long], cq: Array[Long]): Array[Long] = {
    val rq = new Array[Long](vq.length)
    var i = 0
    while (i < vq.length) { rq(i) = vq(i) - cq(i); i += 1 }
    rq
  }

  /** Per-subspace ADC distance tables for one quantized query vector:
    * dtab(s)(cIdx) = dot(query subvector s, codeword cIdx) — exact
    * integers.
    */
  private[pipeline] def dotTables(books: Codebooks, vq: Array[Long],
      subDim: Int): Array[Array[Long]] =
    Array.tabulate(books.length) { s =>
      val qs = slice(vq, s, subDim)
      books(s).map { case (_, cq) =>
        var d = 0L; var i = 0
        while (i < subDim) { d += qs(i) * cq(i); i += 1 }
        d
      }
    }

  /** PQ-encode a residual to its m codeword IDS (nearest by integer
    * squared L2, ties to the smaller id).
    */
  private[pipeline] def encodeIds(books: Codebooks, rq: Array[Long],
      subDim: Int): Array[Long] =
    Array.tabulate(books.length)(s =>
      books(s)(nearestCodeIdx(books(s), slice(rq, s, subDim)))._1)

  /** Train `m` per-subspace codebooks with `iters` exact-integer Lloyd
    * rounds (init = subvectors of every `codeStride`-th vector). Each
    * round shuffles only (subspace, cell, dim) partial sums — nothing
    * corpus-sized — and collects cells × dims rows to the driver.
    */
  def trainCodebooks(evq: DataFrame, m: Int, subDim: Int,
      codeStride: Int, iters: Int): Codebooks = {
    val spark = evq.sparkSession
    import spark.implicits._
    val ds = evq.as[(Long, Array[Long])]
    var books: Codebooks = {
      val init = ds.filter(_._1 % codeStride == 0).collect().sortBy(_._1)
      Array.tabulate(m)(s => init.map { case (id, vq) => id -> slice(vq, s, subDim) })
    }
    var it = 0
    while (it < iters) {
      val cb = books
      val assigned = ds.flatMap { case (_, vq) =>
        (0 until m).iterator.map { s =>
          val svq = slice(vq, s, subDim)
          (s, cb(s)(nearestCodeIdx(cb(s), svq))._1, svq)
        }
      }.toDF("s", "cell", "svq")
      books = assigned
        .select(col("s"), col("cell"), posexplode(col("svq")).as(Seq("pos", "x")))
        .groupBy("s", "cell", "pos")
        .agg(floor(sum(col("x")) * 1.0 / count(lit(1))).as("ci"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getLong(1)))
        .map { case ((s, cell), rows) =>
          (s, cell, rows.sortBy(_.getInt(2)).map(_.getLong(3)).toArray)
        }
        .groupBy(_._1)
        .map { case (s, cells) =>
          s -> cells.map(c => c._2 -> c._3).toArray.sortBy(_._1)
        }
        .toArray.sortBy(_._1).map(_._2)
      it += 1
    }
    books
  }

  /** Exhaustive-ADC top-k: every corpus vector is PQ-encoded and scored
    * against every query via the precomputed per-subspace dot tables, in
    * one typed flatMap over one corpus scan. Output score is the exact
    * integer inner product of the quantized query with the PQ
    * reconstruction of the document.
    */
  def knnPqAdc(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, m: Int = 16,
      codeStride: Int = 40, iters: Int = 2, dim: Int = 64): DataFrame =
    knnPqAdcOf(Tables.embeddings(spark, sfDir), nQueries, k, m, codeStride,
      iters, dim)

  /** [[knnPqAdc]] over any (vec_id, embedding) frame. */
  def knnPqAdcOf(embeddings: DataFrame,
      nQueries: Int = 10, k: Int = 5, m: Int = 16,
      codeStride: Int = 40, iters: Int = 2, dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val evq = embeddings
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, Similarity.quantizeVec(v)) }
      .toDF("vec_id", "vq")
    val books = trainCodebooks(evq, m, subDim, codeStride, iters)
    // query side: tiny by contract — collected and closed over, so the
    // corpus pass below is the ONLY distributed stage of the search
    val qRows = evq.as[(Long, Array[Long])]
      .filter(_._1 < nQueries).collect().sortBy(_._1)
    val qIds = qRows.map(_._1)
    // dtab(q)(s)(cIdx) = dot(query subvector, codeword) — exact integers
    val dtab: Array[Array[Array[Long]]] =
      qRows.map { case (_, vq) => dotTables(books, vq, subDim) }
    val scored = evq.as[(Long, Array[Long])]
      .flatMap { case (id, vq) =>
        val codes = Array.tabulate(m)(s => nearestCodeIdx(books(s), slice(vq, s, subDim)))
        qIds.iterator.zipWithIndex.filter(_._1 != id).map { case (qid, qi) =>
          var score = 0L; var s = 0
          while (s < m) { score += dtab(qi)(s)(codes(s)); s += 1 }
          (qid, id, score)
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

  /** IVF-PQ — the classical composed index (the FAISS `IVFPQ` layout):
    * coarse IVF cells prune the search to ~1/nCells of the corpus, and
    * within a cell documents are represented by PQ codes of their
    * RESIDUAL (vector − cell centroid), which is what PQ codebooks
    * compress well — residuals are centered near zero, so the same
    * codebook budget buys far less quantization error than coding raw
    * vectors. Search: the query scores its own cell's members by
    * `dot(q, centroid) + Σ_s dtab[s][code]` — the exact inner product of
    * the query with each document's reconstruction.
    *
    * All arithmetic is exact integers end to end: cell centroids are
    * corpus vectors (their quantized forms), residuals are integer
    * differences, codebooks come from the same integer Lloyd rounds as
    * [[knnPqAdc]], and scores are integer dots — one SQL oracle
    * reproduces index build + search bit-for-bit.
    *
    * Scale shape: centroids and codebooks are parameter-bounded and
    * driver-held; the corpus is touched by typed maps only (assignment,
    * residual, encode+score in ONE pass); at 100 TB each vector persists
    * as one cell id + m code bytes — the layout that keeps a corpus-wide
    * index in cluster memory — and a query reads ~1/nCells of it.
    */
  def knnIvfPq(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, ivfStride: Int = 50, m: Int = 16,
      codeStride: Int = 40, iters: Int = 2, dim: Int = 64): DataFrame = {
    import spark.implicits._
    val subDim = dim / m
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val cents = Similarity.centroidsOf(e, ivfStride)
    // quantized centroid per cell, driver-held (centroids ARE corpus
    // vectors, so their integer forms are exact mirrors of the oracle's)
    val centQ: Map[Long, Array[Long]] = cents.collect()
      .map(r => r.getLong(0) ->
        Similarity.quantizeVec(r.getSeq[Double](1).toArray)).toMap
    val assigned = Similarity.cellAssignments(e, cents)
    // integer residual per vector — what the PQ codebooks are trained on
    val res = assigned.as[(Long, Array[Double], Long)]
      .map { case (id, v, cell) =>
        (id, residual(Similarity.quantizeVec(v), centQ(cell)), cell)
      }
      .toDF("vec_id", "vq", "cell")
    val books = trainCodebooks(res.select("vec_id", "vq"), m, subDim,
      codeStride, iters)
    // query side: quantized full vectors + own cell + centroid dot term
    // (constant within a cell's ranking but part of the true IP score)
    val qRows = assigned.as[(Long, Array[Double], Long)]
      .filter(_._1 < nQueries).collect().sortBy(_._1)
      .map { case (id, v, cell) => (id, Similarity.quantizeVec(v), cell) }
    val cterm: Array[Long] = qRows.map { case (_, vq, cell) =>
      val cq = centQ(cell)
      var d = 0L; var i = 0
      while (i < vq.length) { d += vq(i) * cq(i); i += 1 }
      d
    }
    val dtab: Array[Array[Array[Long]]] =
      qRows.map { case (_, vq, _) => dotTables(books, vq, subDim) }
    val queriesByCell: Map[Long, Array[Int]] =
      qRows.indices.groupBy(i => qRows(i)._3).map { case (c, is) => c -> is.toArray }
    // encode + score the query's cell members in ONE residual pass
    val scored = res.as[(Long, Array[Long], Long)]
      .flatMap { case (id, rq, cell) =>
        queriesByCell.getOrElse(cell, Array.empty[Int]).iterator
          .filter(qi => qRows(qi)._1 != id)
          .map { qi =>
            var score = cterm(qi); var s = 0
            while (s < m) {
              score += dtab(qi)(s)(nearestCodeIdx(books(s), slice(rq, s, subDim)))
              s += 1
            }
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

  /** DuckDB oracle for [[knnIvfPq]] — identical cell assignment (argmax
    * cosine), integer residuals, Lloyd rounds over residual subvectors,
    * and centroid-term + ADC scoring. `nProbe` > 1 widens each query's
    * probe list to its nProbe nearest cells (crank ≤ nProbe over the same
    * ranking the assignment uses) — the [[AnnIndex.probeStore]] recall
    * knob; each member still scores against ITS OWN cell's centroid term.
    */
  def knnIvfPqSql(nQueries: Int = 10, k: Int = 5, ivfStride: Int = 50,
      m: Int = 16, codeStride: Int = 40, iters: Int = 2,
      dim: Int = 64, nProbe: Int = 1,
      deleteWhere: Option[String] = None): String =
    s"""${knnIvfPqCtes(nQueries, ivfStride, m, codeStride, iters, dim, nProbe, deleteWhere)}
       |SELECT query_id, rank, neighbor_id, score
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** The index-BUILD CTE chain, `WITH e … codes` — centroids, cell
    * assignment, residuals, `iters` Lloyd rounds (final codebook CTE is
    * named `c<iters>`), and the per-vector encoding
    * `codes(vec_id, s, code, cell)`. Shared by the search oracles below
    * and by [[AnnIndex.annStoreHealthSql]].
    *
    * `deleteWhere` mirrors [[AnnIndex.deleteFromStore]]'s contract
    * exactly: centroids and codebooks are trained on the FULL corpus (the
    * persisted parameters keep deleted vectors' training influence), and
    * only the final `codes` rows are filtered — delete-in-place, not a
    * rebuild.
    */
  private[pipeline] def knnIvfPqBuildCtes(ivfStride: Int, m: Int,
      codeStride: Int, iters: Int, dim: Int,
      deleteWhere: Option[String]): String = {
    val subDim = dim / m
    val rounds = (1 to iters).map { n =>
      val prev = s"c${n - 1}"
      s"""a$n AS (
         |  SELECT sub.vec_id, sub.s, sub.svq, code_id, row_number() OVER (
         |    PARTITION BY sub.vec_id, sub.s
         |    ORDER BY list_sum(list_transform(generate_series(1, $subDim),
         |      i -> (sub.svq[i] - $prev.cq[i]) * (sub.svq[i] - $prev.cq[i]))) ASC, code_id) AS rk
         |  FROM sub JOIN $prev ON sub.s = $prev.s),
         |g$n AS (SELECT vec_id, s, svq, code_id AS cell FROM a$n WHERE rk = 1),
         |d$n AS (
         |  SELECT s, cell, i, CAST(floor(sum(svq[i]) * 1.0 / count(*)) AS BIGINT) AS ci
         |  FROM g$n CROSS JOIN (SELECT unnest(generate_series(1, $subDim)) AS i) dims
         |  GROUP BY s, cell, i),
         |c$n AS (SELECT s, cell AS code_id, list(ci ORDER BY i) AS cq FROM d$n GROUP BY s, cell)""".stripMargin
    }.mkString(",\n")
    val cFinal = s"c$iters"
    val delPred = deleteWhere.map(p => s" WHERE NOT ($p)").getOrElse("")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS vq
       |  FROM embeddings),
       |cent AS (SELECT vec_id AS centroid_id, v AS cv, vq AS ccq FROM e
       |         WHERE vec_id % $ivfStride = 0),
       |assign AS (
       |  SELECT e.vec_id, e.vq, centroid_id AS cell, row_number() OVER (
       |    PARTITION BY e.vec_id
       |    ORDER BY list_cosine_similarity(cent.cv, e.v) DESC, centroid_id) AS crank
       |  FROM e CROSS JOIN cent),
       |cells AS (SELECT vec_id, vq, cell FROM assign WHERE crank = 1),
       |res AS (
       |  SELECT cells.vec_id, cells.cell,
       |    list_transform(generate_series(1, $dim),
       |      i -> cells.vq[i] - cent.ccq[i]) AS rq
       |  FROM cells JOIN cent ON cells.cell = cent.centroid_id),
       |sub AS (
       |  SELECT vec_id, s, rq[s * $subDim + 1 : (s + 1) * $subDim] AS svq
       |  FROM res CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS s) subs),
       |c0 AS (SELECT s, vec_id AS code_id, svq AS cq FROM sub WHERE vec_id % $codeStride = 0),
       |$rounds,
       |enc AS (
       |  SELECT sub.vec_id, sub.s, code_id AS code, row_number() OVER (
       |    PARTITION BY sub.vec_id, sub.s
       |    ORDER BY list_sum(list_transform(generate_series(1, $subDim),
       |      i -> (sub.svq[i] - $cFinal.cq[i]) * (sub.svq[i] - $cFinal.cq[i]))) ASC, code_id) AS rk
       |  FROM sub JOIN $cFinal ON sub.s = $cFinal.s),
       |codes0 AS (
       |  SELECT enc.vec_id, enc.s, enc.code, res.cell
       |  FROM enc JOIN res ON enc.vec_id = res.vec_id WHERE enc.rk = 1),
       |codes AS (SELECT * FROM codes0$delPred)""".stripMargin
  }

  /** The full index-build + ADC-search CTE chain ending in `ranked`
    * (query_id, neighbor_id, score, rank) — shared by [[knnIvfPqSql]] and
    * [[knnIvfPqRefineSql]] so the refine oracle's candidate stage cannot
    * drift from the plain oracle.
    */
  private def knnIvfPqCtes(nQueries: Int, ivfStride: Int,
      m: Int, codeStride: Int, iters: Int, dim: Int, nProbe: Int,
      deleteWhere: Option[String] = None): String = {
    val subDim = dim / m
    val cFinal = s"c$iters"
    s"""${knnIvfPqBuildCtes(ivfStride, m, codeStride, iters, dim, deleteWhere)},
       |qrank AS (
       |  SELECT vec_id AS query_id, vq AS qvq, cell AS qcell, crank
       |  FROM assign WHERE vec_id < $nQueries),
       |q AS (
       |  SELECT query_id, qvq, qcell,
       |    CAST(list_sum(list_transform(generate_series(1, $dim),
       |      i -> qvq[i] * cent.ccq[i])) AS BIGINT) AS cterm
       |  FROM qrank JOIN cent ON qrank.qcell = cent.centroid_id
       |  WHERE crank <= $nProbe),
       |qd AS (SELECT DISTINCT query_id, qvq FROM q),
       |qsub AS (
       |  -- built from the DEDUPLICATED query projection: q has one row per
       |  -- probed cell, and duplicate (query, s) rows here would double-
       |  -- count every pdot in scored's sum under nProbe > 1
       |  SELECT query_id, s, qvq[s * $subDim + 1 : (s + 1) * $subDim] AS qsvq
       |  FROM qd CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS s) subs),
       |dtab AS (
       |  SELECT qsub.query_id, c.s, c.code_id,
       |    CAST(list_sum(list_transform(generate_series(1, $subDim),
       |      i -> qsub.qsvq[i] * c.cq[i])) AS BIGINT) AS pdot
       |  FROM qsub JOIN $cFinal c ON qsub.s = c.s),
       |scored AS (
       |  SELECT q.query_id, codes.vec_id AS neighbor_id,
       |    CAST(q.cterm + sum(d.pdot) AS BIGINT) AS score
       |  FROM codes
       |  JOIN q ON codes.cell = q.qcell AND codes.vec_id <> q.query_id
       |  JOIN dtab d ON d.query_id = q.query_id AND codes.s = d.s
       |             AND codes.code = d.code_id
       |  GROUP BY q.query_id, codes.vec_id, q.cterm),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored)""".stripMargin
  }

  /** DuckDB oracle for the two-stage search ([[AnnIndex.refineProbe]]):
    * the shared ADC chain produces the `shortlistK`-deep candidate list
    * per query, then the refine stage rescores exactly those pairs with
    * the EXACT integer dot of the two quantized raw vectors and re-ranks.
    */
  def knnIvfPqRefineSql(nQueries: Int = 10, k: Int = 5, shortlistK: Int = 20,
      ivfStride: Int = 50, m: Int = 16, codeStride: Int = 40, iters: Int = 2,
      dim: Int = 64, nProbe: Int = 1): String =
    s"""${knnIvfPqCtes(nQueries, ivfStride, m, codeStride, iters, dim, nProbe)},
       |shortlist AS (SELECT query_id, neighbor_id FROM ranked
       |              WHERE rank <= $shortlistK),
       |exact AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    CAST(list_sum(list_transform(generate_series(1, $dim),
       |      i -> qe.vq[i] * ne.vq[i])) AS BIGINT) AS score
       |  FROM shortlist s
       |  JOIN e qe ON qe.vec_id = s.query_id
       |  JOIN e ne ON ne.vec_id = s.neighbor_id),
       |rranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, neighbor_id) AS rank
       |  FROM exact)
       |SELECT query_id, rank, neighbor_id, score
       |FROM rranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** DuckDB oracle — identical quantization, per-subspace integer Lloyd
    * rounds, final encoding, ADC tables, and integer scores.
    */
  def knnPqAdcSql(nQueries: Int = 10, k: Int = 5, m: Int = 16,
      codeStride: Int = 40, iters: Int = 2, dim: Int = 64): String = {
    val subDim = dim / m
    val rounds = (1 to iters).map { n =>
      val prev = s"c${n - 1}"
      s"""a$n AS (
         |  SELECT sub.vec_id, sub.s, sub.svq, code_id, row_number() OVER (
         |    PARTITION BY sub.vec_id, sub.s
         |    ORDER BY list_sum(list_transform(generate_series(1, $subDim),
         |      i -> (sub.svq[i] - $prev.cq[i]) * (sub.svq[i] - $prev.cq[i]))) ASC, code_id) AS rk
         |  FROM sub JOIN $prev ON sub.s = $prev.s),
         |g$n AS (SELECT vec_id, s, svq, code_id AS cell FROM a$n WHERE rk = 1),
         |d$n AS (
         |  SELECT s, cell, i, CAST(floor(sum(svq[i]) * 1.0 / count(*)) AS BIGINT) AS ci
         |  FROM g$n CROSS JOIN (SELECT unnest(generate_series(1, $subDim)) AS i) dims
         |  GROUP BY s, cell, i),
         |c$n AS (SELECT s, cell AS code_id, list(ci ORDER BY i) AS cq FROM d$n GROUP BY s, cell)""".stripMargin
    }.mkString(",\n")
    val cFinal = s"c$iters"
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS vq
       |  FROM embeddings),
       |sub AS (
       |  SELECT vec_id, s, vq[s * $subDim + 1 : (s + 1) * $subDim] AS svq
       |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS s) subs),
       |c0 AS (SELECT s, vec_id AS code_id, svq AS cq FROM sub WHERE vec_id % $codeStride = 0),
       |$rounds,
       |enc AS (
       |  SELECT sub.vec_id, sub.s, code_id AS code, row_number() OVER (
       |    PARTITION BY sub.vec_id, sub.s
       |    ORDER BY list_sum(list_transform(generate_series(1, $subDim),
       |      i -> (sub.svq[i] - $cFinal.cq[i]) * (sub.svq[i] - $cFinal.cq[i]))) ASC, code_id) AS rk
       |  FROM sub JOIN $cFinal ON sub.s = $cFinal.s),
       |codes AS (SELECT vec_id, s, code FROM enc WHERE rk = 1),
       |dtab AS (
       |  SELECT q.vec_id AS query_id, c.s, c.code_id,
       |    CAST(list_sum(list_transform(generate_series(1, $subDim),
       |      i -> q.svq[i] * c.cq[i])) AS BIGINT) AS pdot
       |  FROM sub q JOIN $cFinal c ON q.s = c.s
       |  WHERE q.vec_id < $nQueries),
       |scored AS (
       |  SELECT d.query_id, codes.vec_id AS neighbor_id,
       |    CAST(sum(d.pdot) AS BIGINT) AS score
       |  FROM codes JOIN dtab d ON codes.s = d.s AND codes.code = d.code_id
       |  WHERE codes.vec_id <> d.query_id
       |  GROUP BY d.query_id, codes.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, score
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Recall@k audit of the IVF-PQ index against exact brute-force cosine —
    * THE quality metric an ANN deployment tracks (quantization + cell
    * pruning both trade recall for speed; this query measures how much was
    * actually traded, per query). Ground truth is
    * [[Similarity.knnBruteForce]]'s top-k (cosine over doubles,
    * deterministic tiebreak); the approximate side is [[knnIvfPq]]'s top-k
    * over the same corpus and parameters as the persisted store. Output:
    * one row per query — (query_id, hits, recall) with hits = |approx ∩
    * exact| and recall = hits/k.
    *
    * Scale shape: both legs are the already-benchmarked bounded pipelines
    * (brute force = one broadcast-join corpus scan; ADC = ~1/nCells per
    * query); the intersection is a k-row-per-query join — request-sized,
    * never corpus-sized. At 100 TB the audit runs on a sampled query set
    * exactly like this one.
    */
  def annRecall(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, ivfStride: Int = 50, m: Int = 16,
      codeStride: Int = 40, iters: Int = 2, dim: Int = 64): DataFrame = {
    val exact = Similarity.knnBruteForce(spark, sfDir, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = knnIvfPq(spark, sfDir, nQueries, k, ivfStride, m,
        codeStride, iters, dim)
      .select(col("query_id"), col("neighbor_id"))
      .withColumn("hit", lit(1L))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(coalesce(sum(col("hit")), lit(0L)).cast("long").as("hits"))
      .withColumn("recall", round(col("hits") / lit(k.toDouble), 4))
      .orderBy("query_id")
  }

  /** DuckDB oracle for [[annRecall]] — the two published oracle chains
    * ([[Similarity.knnBruteForceSql]], [[knnIvfPqSql]]) joined on
    * (query_id, neighbor_id), so the recall arithmetic cannot drift from
    * either leg's own gate.
    */
  def annRecallSql(nQueries: Int = 10, k: Int = 5, ivfStride: Int = 50,
      m: Int = 16, codeStride: Int = 40, iters: Int = 2,
      dim: Int = 64): String =
    s"""WITH exact_k AS (FROM (${Similarity.knnBruteForceSql(nQueries, k)})),
       |approx_k AS (FROM (${knnIvfPqSql(nQueries, k, ivfStride, m, codeStride, iters, dim)}))
       |SELECT e.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS hits,
       |  round(count(a.neighbor_id) * 1.0 / $k, 4) AS recall
       |FROM exact_k e LEFT JOIN approx_k a
       |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin
}

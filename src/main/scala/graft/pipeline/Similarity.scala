package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the oracle-checkable baseline, an
  * IVF-partitioned variant as the scale path, and a random-hyperplane LSH
  * bucketing for near-dup candidate generation.
  *
  * Scale design: brute force is O(queries × corpus) — fine when the query
  * set is small and broadcast (the corpus is scanned once, no shuffle).
  * IVF cuts the scanned fraction to ~1/nCells per query at the cost of a
  * centroid assignment pass. All vector math is `zip_with`/`aggregate`
  * column expressions — codegen-friendly, no UDF serialization.
  */
object Similarity {

  /** float[] → double[] so all math is double (matches the oracle, which
    * casts to DOUBLE[]).
    */
  def toDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cosine similarity via the native codegen expression
    * ([[graft.functions.CosineSimilarity]], registered as `graft_cosine` by
    * GraftExtensions) — bit-identical arithmetic to the fold form
    * `dot(a,b) / (norm(a)*norm(b))` (left-to-right, same summation order as
    * the oracle's list_cosine_similarity), but one fused primitive loop
    * inside whole-stage codegen instead of three interpreted HOF folds.
    */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** THE JVM mirror of [[cosine]] / `list_cosine_similarity` — same index
    * order, same double ops, and symmetric (IEEE multiply commutes, the
    * two norm accumulators swap roles cleanly). Every typed-map pair
    * kernel must call this one definition so the oracle-exact arithmetic
    * lives in exactly one place.
    */
  private[pipeline] def cosJvm(x: Array[Double], y: Array[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < x.length) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Brute-force top-k cosine neighbors for the query set `vec_id < nQueries`
    * (self excluded). The query side is broadcast: one scan of the corpus,
    * then a per-query window to rank — deterministic tiebreak on vec_id.
    */
  def knnBruteForce(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val queries = e.where(col("vec_id") < nQueries)
      .withColumnRenamed("vec_id", "query_id").withColumnRenamed("v", "qv")
    val scored = e.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

  def knnBruteForceSql(nQueries: Int = 10, k: Int = 5): String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos
       |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** FILTERED vector search — per-query metadata predicate + top-k (the
    * faiss IDSelector / Milvus filtered-search shape): each query wants
    * its k nearest neighbors AMONG vectors sharing its `label`. The
    * filter becomes an EQUI-join key, so what brute-force kNN runs as a
    * broadcast nested loop over the whole corpus here joins
    * `(label)`-keyed — every query scores only its label's stratum,
    * which is both the semantics (results outside the filter are
    * worthless) and the cost win (corpus × selectivity per query).
    *
    * This is the PRE-FILTER strategy, correct at any selectivity; the
    * post-filter alternative (ANN shortlist, then drop non-matching)
    * under-fills k whenever the filter is selective — the classic
    * filtered-ANN failure. At 100 TB the stratum scan composes with the
    * IVF cell layout (probe cells within the label partition);
    * label-partitioned storage makes the stratum scan a partition prune.
    */
  def knnFiltered(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), toDoubleVec(col("embedding")).as("v"))
    val queries = e.where(col("vec_id") < nQueries).select(
      col("vec_id").as("query_id"), col("label").as("qlabel"),
      col("v").as("qv"))
    val scored = e.join(broadcast(queries),
        col("label") === col("qlabel") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("label").cast("long").as("label"),
        col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

  def knnFilteredSql(nQueries: Int = 10, k: Int = 5): String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, CAST(e.label AS BIGINT) AS label,
       |    e.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos
       |  FROM embeddings q JOIN embeddings e
       |    ON e.label = q.label AND e.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, label, rank, neighbor_id, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** IVF-style ANN: deterministic centroid set (`vec_id % centroidStride
    * == 0`), every vector assigned to its nearest centroid (cell), queries
    * search ONLY their own cell. At scale the cell assignment is a
    * broadcast join + argmax (no shuffle of the corpus beyond one pass) and
    * each query scans ~1/nCells of the data. Recall is approximate by
    * construction — neighbors in foreign cells are missed; that is the
    * documented trade.
    */
  private[pipeline] def centroidsOf(e: DataFrame, centroidStride: Int): DataFrame =
    e.where(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"))

  /** Nearest centroid per vector (argmax cosine, tiebreak min centroid_id)
    * as a shuffle-free typed map: the centroid set is k×dim — bounded by k,
    * never by the corpus — so it is collected to the driver and closed over
    * (the MLlib k-means shape). Each corpus row computes its argmax in one
    * tight JVM loop and nothing corpus-sized ever reaches an exchange,
    * unlike a groupBy(vec_id) argmax, which shuffles one (vector-payload)
    * row per corpus row just because Spark cannot know vec_id is unique.
    *
    * Arithmetic mirrors `graft_cosine(cv, v)` bit-for-bit (dot/|cv|²/|v|²
    * accumulated left-to-right in index order, result dot/(√·√)), and the
    * tiebreak mirrors `max_by(centroid_id, struct(ccos, -centroid_id))`
    * including NaN-greatest ordering via `java.lang.Double.compare` — so
    * the DuckDB oracles keep matching value-for-value.
    */
  private[pipeline] def cellAssignments(e: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val centArr: Array[(Long, Array[Double])] = centroids
      .select(col("centroid_id"), col("cv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    e.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
      .map { case (id, v) => (id, v, nearestCentroid(centArr, v)) }
      .toDF("vec_id", "v", "cell")
  }

  /** Argmax-cosine cell for one vector — the JVM mirror of
    * `max_by(centroid_id, struct(graft_cosine(cv, v), -centroid_id))`.
    * A centroid of mismatched length yields a NULL cosine in the Column
    * form and can never win there (nulls sort below every struct value),
    * so here it is skipped; if no centroid is comparable the smallest
    * centroid id is returned (the case is unreachable on well-formed data).
    */
  private[pipeline] def nearestCentroid(centArr: Array[(Long, Array[Double])],
      v: Array[Double]): Long = {
    var bestId = Long.MaxValue; var best = 0.0; var found = false
    var c = 0
    while (c < centArr.length) {
      val (cid, cv) = centArr(c)
      if (cv.length == v.length) {
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < v.length) {
          val xv = cv(i); val yv = v(i)
          dot += xv * yv; nx += xv * xv; ny += yv * yv
          i += 1
        }
        val cos = dot / (math.sqrt(nx) * math.sqrt(ny))
        val cmp = java.lang.Double.compare(cos, best)
        if (!found || cmp > 0 || (cmp == 0 && cid < bestId)) {
          found = true; best = cos; bestId = cid
        }
      } else if (!found && cid < bestId) bestId = cid
      c += 1
    }
    bestId
  }

  /** Score each (query, same-cell vector) pair and keep the per-query
    * top-k — queryCells columns: (query_id, qv, qcell).
    */
  private def searchCells(assigned: DataFrame, queryCells: DataFrame, k: Int): DataFrame = {
    val scored = assigned.join(broadcast(queryCells),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

  def knnIvf(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, centroidStride: Int = 50): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val assigned = cellAssignments(e, centroidsOf(e, centroidStride))
    val queries = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell").as("qcell"))
    searchCells(assigned, queries, k)
  }

  /** IVF with multi-probe: queries search their `nProbe` nearest cells
    * instead of one — the standard IVF recall knob (recall lost to a
    * query sitting near a cell boundary is recovered by probing the
    * neighboring cell; scan cost grows to ~nProbe/nCells of the corpus).
    * Corpus vectors stay assigned to exactly one cell; only the query
    * side fans out, and the query×centroid ranking is a window over a
    * queries×centroids frame — tiny, because queries are few and
    * centroids are the broadcast-sized set by construction.
    */
  def knnIvfProbe(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, centroidStride: Int = 50,
      nProbe: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val centroids = centroidsOf(e, centroidStride)
    val assigned = cellAssignments(e, centroids)
    // query → its nProbe nearest cells (queries × centroids is tiny:
    // both sides are broadcast-scale)
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("centroid_id"))
    val queryCells = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .join(broadcast(centroids), lit(true))
      .withColumn("qcos", cosine(col("cv"), col("qv")))
      .withColumn("crank", row_number().over(qw))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("qcell"))
    searchCells(assigned, queryCells, k)
  }

  def knnIvfProbeSql(nQueries: Int = 10, k: Int = 5, centroidStride: Int = 50,
      nProbe: Int = 2): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % $centroidStride = 0),
       |assign AS (
       |  SELECT vec_id, v, centroid_id AS cell, row_number() OVER (
       |    PARTITION BY vec_id
       |    ORDER BY list_cosine_similarity(cv, v) DESC, centroid_id) AS crank
       |  FROM e CROSS JOIN c),
       |cells AS (SELECT vec_id, v, cell FROM assign WHERE crank = 1),
       |qcells AS (
       |  SELECT vec_id AS query_id, v AS qv, centroid_id AS qcell, row_number() OVER (
       |    PARTITION BY vec_id
       |    ORDER BY list_cosine_similarity(cv, v) DESC, centroid_id) AS crank
       |  FROM e CROSS JOIN c WHERE vec_id < $nQueries),
       |q AS (SELECT query_id, qv, qcell FROM qcells WHERE crank <= $nProbe),
       |scored AS (
       |  SELECT q.query_id, e2.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.qv, e2.v) AS cos
       |  FROM cells e2 JOIN q ON e2.cell = q.qcell AND e2.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  def knnIvfSql(nQueries: Int = 10, k: Int = 5, centroidStride: Int = 50): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % $centroidStride = 0),
       |assign AS (
       |  SELECT vec_id, v, centroid_id AS cell, row_number() OVER (
       |    PARTITION BY vec_id
       |    ORDER BY list_cosine_similarity(cv, v) DESC, centroid_id) AS crank
       |  FROM e CROSS JOIN c),
       |cells AS (SELECT vec_id, v, cell FROM assign WHERE crank = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv, cell FROM cells WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q.query_id, e2.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.qv, e2.v) AS cos
       |  FROM cells e2 JOIN q ON e2.cell = q.cell AND e2.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------- trained IVF (k-means)

  /** round(x*1000) half-away-from-zero in the JVM — the same integer
    * quantization the hyperplane-LSH bucketing uses, mirrored by DuckDB's
    * `CAST(round(x*1000) AS BIGINT)`.
    */
  private[pipeline] def quantizeVec(v: Array[Double]): Array[Long] = {
    val q = new Array[Long](v.length); var i = 0
    while (i < v.length) {
      val y = v(i) * 1000
      q(i) = (if (y >= 0) math.floor(y + 0.5) else -math.floor(-y + 0.5)).toLong
      i += 1
    }
    q
  }

  /** Spherical k-means centroids, trained deterministically: stride-sample
    * init, `iters` Lloyd rounds of (argmax-cosine assignment → per-cell
    * mean). The update is EXACT INTEGER arithmetic — vectors quantized to
    * round(x*1000), new centroid component = floor(sum/count) — because a
    * float mean's summation order differs between Spark partial aggregates
    * and the oracle engine, and a last-ulp centroid difference can flip a
    * boundary vector's cell and break the value-level oracle. Integer sums
    * are order-free, so training is reproducible bit-for-bit in SQL.
    *
    * Scale shape per round: the k×dim centroid set lives on the driver
    * (bounded by k, never by the corpus — the MLlib k-means shape) and the
    * assignment is a pure typed-map pass closing over it, so NOTHING
    * corpus-sized is ever shuffled or broadcast-expanded; the centroid
    * update shuffles only (cell, dim) partial sums — cells×64 rows per
    * input partition after map-side combine, independent of corpus size.
    * Each round is exactly one job: map → posexplode → partial agg → tiny
    * exchange → collect of cells×dim rows. (The previous chained-lazy-
    * DataFrame form re-ran every earlier round inside each broadcast
    * materialization and shuffled a vector-payload row per corpus row per
    * round.) Empty cells drop out (their id simply stops existing),
    * identically in the oracle.
    */
  def trainedCentroidsOf(e: DataFrame, stride: Int = 50, iters: Int = 3): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val ev = e.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
    var cents: Array[(Long, Array[Long])] = ev
      .filter(r => r._1 % stride == 0).collect()
      .sortBy(_._1)
      .map { case (id, v) => id -> quantizeVec(v) }
    var it = 0
    while (it < iters) {
      val centArr = cents.map { case (id, cq) => id -> cq.map(_.toDouble) }
      val assigned = ev
        .map { case (_, v) => (nearestCentroid(centArr, v), quantizeVec(v)) }
        .toDF("cell", "vq")
      cents = assigned
        .select(col("cell"), posexplode(col("vq")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(floor(sum(col("x")) * 1.0 / count(lit(1))).as("ci"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray
        }
        .toArray.sortBy(_._1)
      it += 1
    }
    cents.toSeq.toDF("centroid_id", "cq")
  }

  /** [[knnIvf]] with k-means-trained cells instead of raw stride samples —
    * same search flow, better-shaped cells (recall is no longer data-
    * layout luck; the recall-dominance spec measures the improvement).
    */
  def knnIvfTrained(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, centroidStride: Int = 50,
      iters: Int = 3): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val cents = trainedCentroidsOf(e, centroidStride, iters)
      .select(col("centroid_id"), transform(col("cq"), _.cast("double")).as("cv"))
    val assigned = cellAssignments(e, cents)
    val queries = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell").as("qcell"))
    searchCells(assigned, queries, k)
  }

  /** Shared DuckDB CTE chain reproducing [[trainedCentroidsOf]] +
    * [[cellAssignments]] bit-for-bit: `WITH e AS ..., cells AS (vec_id, v,
    * cell)`. Suffixed by [[knnIvfTrainedSql]] (cell search) and
    * [[SemanticDedup.semanticPairsSql]] (intra-cell pair join).
    */
  private[pipeline] def trainedCellsSqlWith(centroidStride: Int, iters: Int,
      dim: Int): String = {
    val rounds = (1 to iters).map { n =>
      val prev = s"c${n - 1}"
      s"""a$n AS (
         |  SELECT e.vec_id, e.vq, centroid_id, row_number() OVER (
         |    PARTITION BY e.vec_id
         |    ORDER BY list_cosine_similarity($prev.cq::DOUBLE[], e.v) DESC, centroid_id) AS rk
         |  FROM e CROSS JOIN $prev),
         |g$n AS (SELECT vec_id, vq, centroid_id AS cell FROM a$n WHERE rk = 1),
         |d$n AS (
         |  SELECT cell, i, CAST(floor(sum(vq[i])*1.0/count(*)) AS BIGINT) AS ci
         |  FROM g$n CROSS JOIN (SELECT unnest(generate_series(1, $dim)) AS i) dims
         |  GROUP BY cell, i),
         |c$n AS (SELECT cell AS centroid_id, list(ci ORDER BY i) AS cq FROM d$n GROUP BY cell)""".stripMargin
    }.mkString(",\n")
    val cFinal = s"c$iters"
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS vq
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS centroid_id, vq AS cq FROM e WHERE vec_id % $centroidStride = 0),
       |$rounds,
       |assign AS (
       |  SELECT e.vec_id, e.v, centroid_id AS cell, row_number() OVER (
       |    PARTITION BY e.vec_id
       |    ORDER BY list_cosine_similarity($cFinal.cq::DOUBLE[], e.v) DESC, centroid_id) AS crank
       |  FROM e CROSS JOIN $cFinal),
       |cells AS (SELECT vec_id, v, cell FROM assign WHERE crank = 1)""".stripMargin
  }

  /** DuckDB oracle for [[knnIvfTrained]] — the identical quantized Lloyd
    * rounds as CTE chains, then the identical cell search.
    */
  def knnIvfTrainedSql(nQueries: Int = 10, k: Int = 5, centroidStride: Int = 50,
      iters: Int = 3, dim: Int = 64): String =
    s"""${trainedCellsSqlWith(centroidStride, iters, dim)},
       |q AS (SELECT vec_id AS query_id, v AS qv, cell FROM cells WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q.query_id, e2.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.qv, e2.v) AS cos
       |  FROM cells e2 JOIN q ON e2.cell = q.cell AND e2.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Deterministic pseudo-random hyperplanes as INTEGER weight vectors in
    * [-1024, 1023] (LCG-derived, fixed across runs). Integer weights ×
    * integer-quantized coordinates keep the whole bucketing in exact
    * 64-bit arithmetic, so the oracle SQL reproduces the buckets
    * bit-for-bit — no float summation-order hazards at the sign boundary.
    */
  private def lshPlanes(nTables: Int, planesPerTable: Int, dim: Int): Seq[Seq[Seq[Long]]] = {
    var state = 7L
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 33) & 2047L) - 1024L
    }
    Seq.fill(nTables)(Seq.fill(planesPerTable)(Seq.fill(dim)(next())))
  }

  /** Random-hyperplane LSH bucketing with OR-amplification: `nTables`
    * independent hash tables of `planesPerTable` sign bits each; candidate
    * pairs share a bucket in ≥1 table, then are verified by exact cosine.
    * Shuffle is O(vectors × tables), never O(pairs).
    *
    * Regime note (measured on this corpus): at threshold 0.4 (θ≈66°, near-
    * orthogonal pairs) sign-LSH prunes no faster than it loses recall, so
    * [[graft.pipeline.Dedup.embeddingCosine]] stays exact. This operator is
    * the scale path for the HIGH-cosine regime (≥ ~0.8) where p_collision
    * per bit → 1 and buckets shrink exponentially with planesPerTable —
    * see the planted-near-dup recall spec.
    */
  def cosineLshPairs(spark: SparkSession, sfDir: String,
      nTables: Int = 8, planesPerTable: Int = 6,
      threshold: Double = 0.4, dim: Int = 64): DataFrame =
    cosineLshPairsOf(Tables.embeddings(spark, sfDir), nTables, planesPerTable,
      threshold, dim)

  /** [[cosineLshPairs]] over any (vec_id, embedding) frame — the table-free
    * core, reusable for planted-fixture recall tests.
    */
  def cosineLshPairsOf(embeddings: DataFrame,
      nTables: Int = 8, planesPerTable: Int = 6,
      threshold: Double = 0.4, dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val tables = lshPlanes(nTables, planesPerTable, dim)
    val e = embeddings
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    // one (table, bucket) row per vector per table, computed in a single
    // typed flatMap pass: buckets are a pure function of one vector, and
    // the nTables×planesPerTable×dim integer dot products run as tight JVM
    // loops (the Column HOF form — aggregate over zip_with with literal
    // weight arrays — interprets ~3k lambda calls per row). Quantization
    // mirrors `round(x*1000)` (half away from zero) exactly. Rows carry
    // ids only; the vector payload stays out of the candidate shuffle and
    // is re-joined per candidate for the exact-cosine verify.
    val planeArr: Array[Array[Array[Long]]] = tables.map(_.map(_.toArray).toArray).toArray
    val bucketed = e.as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        val xq = new Array[Long](v.length)
        var i = 0
        while (i < v.length) {
          val y = v(i) * 1000
          xq(i) = (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
          i += 1
        }
        Iterator.tabulate(planeArr.length) { t =>
          val planes = planeArr(t)
          // bucket = Σ bit_p · 2^(P-1-p): fold acc*2 + sign-bit in plane order
          var bucket = 0L
          var p = 0
          while (p < planes.length) {
            val w = planes(p)
            var dot = 0L
            var j = 0
            // bound by BOTH lengths: a malformed short vector contributes 0
            // for its missing coordinates instead of crashing the job
            val n = math.min(w.length, xq.length)
            while (j < n) { dot += w(j) * xq(j); j += 1 }
            bucket = bucket * 2 + (if (dot >= 0) 1L else 0L)
            p += 1
          }
          (id, t, bucket)
        }
      }
      .toDF("vec_id", "tbl", "bucket")
    val a = bucketed.as("a"); val b = bucketed.as("b")
    val vecs = e.select(col("vec_id"), col("v"))
    a.join(b, col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col("vec_id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("vec_id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
      .orderBy("id_a", "id_b")
  }

  /** Deterministic planted near-dups: for every `stride`-th vector, a copy
    * with one coordinate bumped by `bump` (coordinate index rotates with
    * the vector id so the perturbation isn't axis-degenerate) under a
    * disjoint id range. cosine(original, copy) ≈ 0.997 on this unit-norm
    * corpus — squarely in the high-cosine regime [[cosineLshPairs]] is the
    * scale path for, which the natural fixture (max pairwise cosine ≈ 0.51)
    * never exercises. Both Spark and the DuckDB oracle derive the SAME
    * augmentation from the same parquet, so the `dedup_embedding_ann`
    * oracle row carries real rows: a broken candidate join or verify now
    * fails the hash gate instead of matching vacuously at 0 = 0 rows.
    *
    * The frame is emitted in double space (originals cast) so the union is
    * type-stable and the bump arithmetic is one IEEE double add in both
    * engines.
    */
  def plantNearDups(embeddings: DataFrame, stride: Int = 97,
      idOffset: Long = 10000000L, bump: Double = 0.08): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      toDoubleVec(col("embedding")).as("embedding"))
    val coord = expr(s"vec_id div $stride") % lit(64)
    // bump BEFORE the id offset is applied: a single select computing both
    // `vec_id + offset AS vec_id` and the lambda would lateral-alias-shadow
    // vec_id inside `coord` (verified: it moves the bumped coordinate) —
    // in Spark exactly as in the DuckDB oracle
    val planted = e.where(col("vec_id") % stride === 0)
      .withColumn("embedding",
        transform(col("embedding"),
          (x, i) => when(i.cast("long") === coord, x + bump).otherwise(x)))
      .select((col("vec_id") + idOffset).as("vec_id"), col("embedding"))
    e.unionByName(planted)
  }

  /** The flagship embedding-dedup surface entry: hyperplane-LSH candidate
    * pairs at the high-cosine threshold over the corpus augmented with
    * [[plantNearDups]] copies. Same plan shape as [[cosineLshPairs]] — the
    * planted rows only make the oracle row non-vacuous.
    */
  def cosineLshPairsPlanted(spark: SparkSession, sfDir: String,
      nTables: Int = 8, planesPerTable: Int = 6,
      threshold: Double = 0.8, dim: Int = 64): DataFrame =
    cosineLshPairsOf(plantNearDups(Tables.embeddings(spark, sfDir)),
      nTables, planesPerTable, threshold, dim)

  /** DuckDB CTE mirroring [[plantNearDups]] — exposed as `embeddings_aug`. */
  private[pipeline] def plantNearDupsCte(stride: Int, idOffset: Long,
      bump: Double): String =
    s"""ebase AS (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings),
       |planted AS (
       |  -- bump computed BEFORE the id offset is applied (a same-SELECT
       |  -- `vec_id + offset AS vec_id` alias would lateral-shadow vec_id
       |  -- inside the lambda and move the bumped coordinate)
       |  SELECT vec_id,
       |    list_transform(generate_series(1, 64), i ->
       |      CASE WHEN i - 1 = (vec_id // $stride) % 64
       |           THEN embedding[i] + $bump ELSE embedding[i] END) AS embedding
       |  FROM ebase WHERE vec_id % $stride = 0),
       |embeddings_aug AS (
       |  SELECT vec_id, embedding FROM ebase
       |  UNION ALL
       |  SELECT vec_id + $idOffset AS vec_id, embedding FROM planted)""".stripMargin

  /** DuckDB oracle for [[cosineLshPairsPlanted]]. */
  def cosineLshPairsPlantedSql(nTables: Int = 8, planesPerTable: Int = 6,
      threshold: Double = 0.8, dim: Int = 64, stride: Int = 97,
      idOffset: Long = 10000000L, bump: Double = 0.08): String =
    s"""WITH ${plantNearDupsCte(stride, idOffset, bump)},
       |${cosineLshPairsBodySql("embeddings_aug", nTables, planesPerTable, threshold, dim)}""".stripMargin

  /** DuckDB oracle for [[cosineLshPairs]] — identical integer bucketing
    * (literal weight vectors), identical exact-cosine verify.
    */
  def cosineLshPairsSql(nTables: Int = 8, planesPerTable: Int = 6,
      threshold: Double = 0.4, dim: Int = 64): String =
    s"""WITH ${cosineLshPairsBodySql("embeddings", nTables, planesPerTable, threshold, dim)}""".stripMargin

  /** Shared oracle body over any (vec_id, embedding) relation `source` —
    * the CTE chain after `WITH` (callers prepend their own CTEs).
    */
  private def cosineLshPairsBodySql(source: String, nTables: Int,
      planesPerTable: Int, threshold: Double, dim: Int): String = {
    val tables = lshPlanes(nTables, planesPerTable, dim)
    def dotSql(plane: Seq[Long]): String = {
      val w = plane.mkString("[", ", ", "]")
      s"list_sum(list_transform(generate_series(1, $dim), i -> ($w)[i] * xq[i]))"
    }
    val bucketCols = tables.map { planes =>
      planes.zipWithIndex.map { case (p, i) =>
        val weight = 1L << (planesPerTable - 1 - i)
        s"(CASE WHEN ${dotSql(p)} >= 0 THEN $weight ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }.mkString("[", ",\n    ", "]")
    s"""e AS (
       |  SELECT vec_id, embedding,
       |    list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS xq
       |  FROM $source),
       |bk AS (SELECT vec_id, embedding,
       |    $bucketCols AS buckets
       |  FROM e),
       |banded AS (
       |  SELECT vec_id, embedding, tbl, buckets[tbl + 1] AS bucket
       |  FROM bk CROSS JOIN (SELECT unnest(generate_series(0, ${nTables - 1})) AS tbl) tables),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b,
       |  round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 4) AS cosine
       |FROM cand JOIN e x ON cand.id_a = x.vec_id JOIN e y ON cand.id_b = y.vec_id
       |WHERE list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ------------------------------------------- binary quantization + rerank

  /** Pack 32 sign bits of `v` (positions `off+1 .. off+32`, 1-based) into
    * one long — bit i set iff the component is > 0. The 64-dim embedding
    * becomes TWO 32-bit halves in longs rather than one 64-bit word so
    * neither engine ever materializes a 2^63 term (BIGINT sign overflow);
    * the sum-of-whens unrolls into one codegen'd expression.
    */
  private def packBits(v: Column, off: Int): Column =
    (0 until 32).map(i =>
      when(element_at(v, off + i + 1) > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)

  /** BINARY-QUANTIZED ANN (the public 1-bit quantization + rerank design,
    * e.g. faiss `IndexBinaryFlat` shortlisting): each vector's sign
    * pattern packs into 16 bytes, the shortlist pass ranks by Hamming
    * distance (`bit_count(xor)` — two popcounts per candidate instead of
    * a 64-term float dot product, a 32× smaller scan that SIMD-vectorizes
    * inside whole-stage codegen), and only the `shortlist` best per query
    * pay the exact cosine rerank. Deterministic end to end (sign bits and
    * popcounts have no float rounding; ties break on vec_id), so the
    * DuckDB oracle replays the same shortlist+rerank exactly.
    *
    * Scale shape: signatures are 16 bytes/vector — a 100 TB float corpus
    * is a ~1.6 TB signature scan, and the shortlist join broadcasts only
    * the query signatures; the expensive cosine touches `shortlist` rows
    * per query. A deployment composes this with IVF (scan only the
    * probed cells' signatures); the composition point is
    * [[AnnIndex]]'s cell layout, unchanged by signature type.
    */
  def knnBinaryHamming(spark: SparkSession, sfDir: String, nQueries: Int = 10,
      shortlist: Int = 50, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("sig_lo", packBits(col("v"), 0))
      .withColumn("sig_hi", packBits(col("v"), 32))
    val q = e.where(col("vec_id") < nQueries).select(
      col("vec_id").as("query_id"), col("v").as("qv"),
      col("sig_lo").as("qlo"), col("sig_hi").as("qhi"))
    val ham = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("hamming",
        expr("bit_count(sig_lo ^ qlo) + bit_count(sig_hi ^ qhi)").cast("long"))
    val wShort = Window.partitionBy("query_id").orderBy(col("hamming"), col("vec_id"))
    val wRank = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    ham.withColumn("hrank", row_number().over(wShort))
      .where(col("hrank") <= shortlist)
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"), col("hamming"))
      .orderBy("query_id", "rank")
  }

  def knnBinaryHammingSql(nQueries: Int = 10, shortlist: Int = 50,
      k: Int = 5): String =
    s"""WITH packed AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    CAST(list_sum(list_transform(generate_series(0, 31), bi ->
       |      CASE WHEN embedding[bi + 1] > 0 THEN (1::BIGINT << bi)
       |           ELSE 0 END)) AS BIGINT) AS sig_lo,
       |    CAST(list_sum(list_transform(generate_series(0, 31), bi ->
       |      CASE WHEN embedding[bi + 33] > 0 THEN (1::BIGINT << bi)
       |           ELSE 0 END)) AS BIGINT) AS sig_hi
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, sig_lo AS qlo, sig_hi AS qhi
       |  FROM packed WHERE vec_id < $nQueries),
       |ham AS (
       |  SELECT q.query_id, e.vec_id, e.v, q.qv,
       |    CAST(bit_count(xor(e.sig_lo, q.qlo))
       |       + bit_count(xor(e.sig_hi, q.qhi)) AS BIGINT) AS hamming
       |  FROM packed e JOIN q ON e.vec_id <> q.query_id),
       |short AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY hamming, vec_id) AS hrank
       |  FROM ham),
       |rer AS (
       |  SELECT query_id, vec_id, hamming,
       |         list_cosine_similarity(qv, v) AS cos
       |  FROM short WHERE hrank <= $shortlist),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, vec_id) AS rank
       |  FROM rer)
       |SELECT query_id, rank, vec_id AS neighbor_id,
       |       round(cos, 4) AS cosine, hamming
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
}

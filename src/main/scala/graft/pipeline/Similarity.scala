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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity as a pure column expression (left-to-right fold —
    * same summation order as the oracle's list_cosine_similarity).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** IVF-style ANN: deterministic centroid set (`vec_id % centroidStride
    * == 0`), every vector assigned to its nearest centroid (cell), queries
    * search ONLY their own cell. At scale the cell assignment is a
    * broadcast join + argmax (no shuffle of the corpus beyond one pass) and
    * each query scans ~1/nCells of the data. Recall is approximate by
    * construction — neighbors in foreign cells are missed; that is the
    * documented trade.
    */
  def knnIvf(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, centroidStride: Int = 50): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val centroids = e.where(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"))

    // nearest centroid per vector (argmax cosine, tiebreak on centroid_id)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("centroid_id"))
    val assigned = e.join(broadcast(centroids), lit(true))
      .withColumn("ccos", cosine(col("cv"), col("v")))
      .withColumn("crank", row_number().over(wAssign))
      .where(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("centroid_id").as("cell"))

    val queries = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell").as("qcell"))
    val scored = assigned.join(broadcast(queries),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

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

  /** Random-hyperplane LSH bucketing with OR-amplification: `nTables`
    * independent hash tables of `planesPerTable` sign bits each; candidate
    * pairs share a bucket in ≥1 table, then are verified by exact cosine.
    * Shuffle is O(vectors × tables), never O(pairs) — the scale path for
    * embedding dedup (recall rises with nTables, bucket size falls with
    * planesPerTable).
    */
  def cosineLshPairs(spark: SparkSession, sfDir: String,
      nTables: Int = 8, planesPerTable: Int = 6,
      threshold: Double = 0.4, dim: Int = 64): DataFrame = {
    // deterministic pseudo-random hyperplanes (LCG), fixed across runs
    var state = 7L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val tables = Seq.fill(nTables)(Seq.fill(planesPerTable)(Seq.fill(dim)(next())))

    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    // one (table, bucket) row per vector per table
    val bucketed = e.select(
      col("vec_id"), col("v"),
      explode(array(tables.zipWithIndex.map { case (planes, t) =>
        val planesCol = array(planes.map(p => array(p.map(lit): _*)): _*)
        struct(lit(t).as("tbl"),
          // left fold over sign bits: bucket = Σ bit_i · 2^i in plane order
          aggregate(
            transform(planesCol, plane => when(dot(plane, col("v")) >= 0, 1L).otherwise(0L)),
            lit(0L), (acc, bit) => acc * 2 + bit).as("bucket"))
      }: _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("tb.tbl"), col("tb.bucket"))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
      .orderBy("id_a", "id_b")
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Record linkage (entity resolution) by deletion-neighborhood blocking —
  * the SymSpell-family construction that makes edit-distance-1 matching
  * recall-COMPLETE without an all-pairs comparison.
  *
  * Each record emits one variant per character position, keyed by
  * `(position, length, name-with-that-position-deleted)`. Completeness
  * for Levenshtein distance ≤ 1 follows by cases:
  *
  *  - substitution (equal lengths): the two strings differ at exactly one
  *    position, so they collide on the variant masking that position
  *    (same `p`, same `len`, same remaining chars);
  *  - insertion/deletion (lengths differ by 1): deleting the inserted
  *    character from the longer string yields the shorter one, so the
  *    longer record's variant equals the shorter record's UNMASKED name;
  *  - identical strings collide on every variant.
  *
  * So candidates = (variant ⋈ variant) ∪ (variant ⋈ base), both plain
  * equi-joins. The Levenshtein filter after the join is the ER "compare"
  * stage — here also a pinning guard, since a collision already proves
  * distance ≤ 1. No similarity join, no cartesian anywhere.
  *
  * Scale shape: one map-side variant explosion (×L rows) and two
  * equi-joins on variant keys; only the colliding pairs are ever
  * compared. Block sizes are bounded by how many records share L−1
  * characters — a hot variant key (low-entropy name zone) would be
  * df-capped exactly like a hot MinHash band in `dedup_minhash_lsh`.
  * For distance ≤ d the same construction emits C(L,d) deletion
  * variants per record — cost grows in EMITTED VARIANTS, never in
  * pairs compared.
  */
object EntityResolution {

  /** All customer-name pairs at Levenshtein distance ≤ 1 — complete by
    * construction, one row per pair: `(custkey_a, custkey_b, dist,
    * diff_pos)` with `diff_pos` the first differing/deleted position.
    */
  def nameMatchPairs(spark: SparkSession, sfDir: String): DataFrame =
    pairsFor(Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("ck"), col("c_name").as("name")))

  /** The blocking+compare core over any `(ck, name)` frame — injectable
    * so the spec can drive it with adversarial name sets (first-position
    * edits that prefix blocking would miss, distance-2 decoys,
    * insertions, exact duplicates) and check against brute force.
    */
  def pairsFor(cIn: DataFrame): DataFrame = {
    // the single-file customer scan is ONE input split — without this
    // fan-out the ×L variant explosion and both join map sides run on a
    // single thread (measured 2× the whole entry's cost at sf0.1); only
    // (ck, name) rows cross the exchange
    val c = cIn.repartition(
      cIn.sparkSession.sparkContext.defaultParallelism)
    val v = c
      .withColumn("p", explode(sequence(lit(1), length(col("name")))))
      .select(col("ck"), col("name"), col("p"),
        concat(expr("substring(name, 1, p - 1)"),
          expr("substring(name, p + 1)")).as("masked"),
        length(col("name")).as("len"))
    val a = v.select(col("p"), col("len"), col("masked"),
      col("ck").as("ck_a"), col("name").as("name_a"))
    val b = v.select(col("p").as("p_b"), col("len").as("len_b"),
      col("masked").as("masked_b"),
      col("ck").as("ck_b"), col("name").as("name_b"))
    // substitution / identity candidates: masked ⋈ masked
    val subs = a.join(b,
        a("p") === b("p_b") && a("len") === b("len_b") &&
          a("masked") === b("masked_b") && a("ck_a") < b("ck_b"))
      .select(col("ck_a"), col("name_a"), col("ck_b"), col("name_b"), col("p"))
    // insertion/deletion candidates: the longer record's variant ⋈ the
    // shorter record's unmasked name (pair order normalized by id)
    val base = c.select(col("ck").as("ck_s"), col("name").as("name_s"))
    val dels = v.join(base,
        v("masked") === base("name_s") &&
          v("len") === length(base("name_s")) + 1)
      .select(
        least(col("ck"), col("ck_s")).as("ck_a"),
        when(col("ck") < col("ck_s"), col("name")).otherwise(col("name_s"))
          .as("name_a"),
        greatest(col("ck"), col("ck_s")).as("ck_b"),
        when(col("ck") < col("ck_s"), col("name_s")).otherwise(col("name"))
          .as("name_b"),
        col("p"))
    val dist: Column = levenshtein(col("name_a"), col("name_b"))
    subs.unionByName(dels)
      .where(dist <= 1) // pinning guard: a collision already proves ≤ 1
      .groupBy(col("ck_a").as("custkey_a"), col("ck_b").as("custkey_b"))
      .agg(min(dist).cast("long").as("dist"),
        min(col("p")).cast("long").as("diff_pos"))
      .orderBy("custkey_a", "custkey_b")
  }

  val nameMatchPairsSql: String =
    """WITH c AS (SELECT c_custkey AS ck, c_name AS name FROM customer),
      |v AS (
      |  SELECT ck, name, p,
      |         substr(name, 1, p - 1) || substr(name, p + 1) AS masked,
      |         length(name) AS len
      |  FROM c, unnest(generate_series(1, length(name))) AS t(p)),
      |subs AS (
      |  SELECT a.ck AS ck_a, a.name AS name_a,
      |         b.ck AS ck_b, b.name AS name_b, a.p
      |  FROM v a JOIN v b
      |    ON a.p = b.p AND a.len = b.len AND a.masked = b.masked
      |   AND a.ck < b.ck),
      |dels AS (
      |  SELECT least(v.ck, s.ck) AS ck_a,
      |         CASE WHEN v.ck < s.ck THEN v.name ELSE s.name END AS name_a,
      |         greatest(v.ck, s.ck) AS ck_b,
      |         CASE WHEN v.ck < s.ck THEN s.name ELSE v.name END AS name_b,
      |         v.p
      |  FROM v JOIN c s
      |    ON v.masked = s.name AND v.len = length(s.name) + 1),
      |cand AS (SELECT * FROM subs UNION ALL SELECT * FROM dels)
      |SELECT ck_a AS custkey_a, ck_b AS custkey_b,
      |       CAST(min(levenshtein(name_a, name_b)) AS BIGINT) AS dist,
      |       CAST(min(p) AS BIGINT) AS diff_pos
      |FROM cand
      |WHERE levenshtein(name_a, name_b) <= 1
      |GROUP BY ck_a, ck_b
      |ORDER BY custkey_a, custkey_b""".stripMargin
}

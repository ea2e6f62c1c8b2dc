package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Arithmetic hash functions expressible identically in Spark Column
  * expressions and in ANSI-ish SQL (DuckDB dialect) — pure integer math, so
  * every hash-dependent operator (MinHash, SimHash, LSH bucketing) is
  * oracle-checkable bit-for-bit. Spark's builtin `hash`/`xxhash64` are
  * Murmur3/XXH64 with Spark-internal seeds that no other engine reproduces;
  * these replace them wherever the result is part of a query contract.
  *
  * All values stay in [0, 2^31) so every intermediate product fits a signed
  * 64-bit integer in both engines: acc*Base + c < 2^31 * 2^8, h*a < 2^62.
  */
object Hashes {

  /** 2^31 - 1 (Mersenne prime) — the modulus for string/affine hashes. */
  val Prime: Long = 2147483647L
  /** modulus for bucket folds (any prime < 2^33 keeps acc*FoldBase in range) */
  val PairPrime: Long = 1000000007L
  /** polynomial base for string hashing */
  val Base: Long = 131L
  /** fold base for hashing fixed-length integer slices */
  val FoldBase: Long = 1000003L

  /** Deterministic (a, b) affine-hash parameter pairs from a 64-bit LCG —
    * reproducible run-to-run and engine-to-engine; a in [1, Prime-1],
    * b in [0, Prime-1].
    */
  def lcgParams(n: Int, seed: Long): Seq[(Long, Long)] = {
    var state = seed
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      state >>> 33
    }
    Seq.fill(n)((next() % (Prime - 1) + 1, next() % Prime))
  }

  /** Polynomial rolling hash over a string's character codes:
    * h = fold(0, (acc, c) => (acc*Base + c) mod Prime). ASCII-safe; both
    * engines see identical codepoints via ascii(substring(s, i, 1)).
    */
  def polyHash(c: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(c)), i => ascii(c.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, ch) => (acc * Base + ch) % Prime)

  /** JVM mirror of [[polyHash]] — bit-identical for ASCII text (charAt ==
    * ascii(substring) for single-byte codepoints). Used inside typed
    * flatMap producers where an interpreted HOF per row would dominate.
    */
  def polyHashJvm(s: String): Long = {
    var acc = 0L; var i = 0
    while (i < s.length) { acc = (acc * Base + s.charAt(i)) % Prime; i += 1 }
    acc
  }

  /** DuckDB-dialect equivalent of [[polyHash]] over column/expression `col`. */
  def polyHashSql(col: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(1, length($col)), i -> CAST(ascii(substring($col, i, 1)) AS BIGINT))), " +
      s"(acc, c) -> (acc * $Base + c) % $Prime)"

  /** Universal affine hash of an already-hashed value: (h*a + b) mod Prime. */
  def affine(h: Column, a: Long, b: Long): Column = (h * a + b) % Prime

  /** JVM mirror of [[affine]] — the one definition the typed-map signature
    * producers share with the Column/SQL forms (h < 2^31 and a < 2^31, so
    * h*a fits a signed 64-bit integer).
    */
  def affineJvm(h: Long, a: Long, b: Long): Long = (h * a + b) % Prime

  def affineSql(h: String, a: Long, b: Long): String = s"(($h * $a + $b) % $Prime)"

  /** Hash a fixed-length array of non-negative longs (e.g. a MinHash band
    * slice) into one bucket id: fold(0, (acc, x) => (acc*FoldBase + x) mod
    * PairPrime).
    */
  def foldBucket(slice: Column): Column =
    aggregate(slice, lit(0L), (acc, x) => (acc * FoldBase + x) % PairPrime)

  /** DuckDB-dialect equivalent of [[foldBucket]] over a list expression. */
  def foldBucketSql(slice: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $slice), " +
      s"(acc, x) -> (acc * $FoldBase + x) % $PairPrime)"
}

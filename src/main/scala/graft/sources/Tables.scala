package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet table loaders for the synthetic star schema + pipeline tables
  * (TESTDATA.md): region nation customer supplier part orders lineitem
  * events documents embeddings, one parquet per table under an sf dir.
  *
  * Reads stay declarative (`spark.read.parquet`) so Catalyst keeps
  * predicate pushdown / column pruning; never cache here — the callers
  * decide lifetimes.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` normalized to a µs `TimestampType` regardless of the
    * fixture's physical encoding. The generated parquet has shipped in two
    * layouts: TIMESTAMP(NANOS) (unreadable natively by Spark 4 — surfaces
    * as a nanos `LongType` under `spark.sql.legacy.parquet.nanosAsLong`,
    * set in GraftSession.FixedConfs) and plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (surfaces as `TimestampNTZType`). Dispatch on
    * the observed type rather than pinning one layout, so a regenerated
    * fixture can't silently break every events consumer:
    *   - nanos long → `timestamp_micros(ns / 1000)`; µs-truncating a ns
    *     instant never crosses a µs-aligned boundary, so second-aligned
    *     comparisons are unaffected.
    *   - NTZ → cast to TimestampType; the session timezone is pinned UTC
    *     (GraftSession.FixedConfs), so the cast reinterprets the naive
    *     value as the same UTC instant DuckDB computes on the oracle side.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType        => timestamp_micros((col("ts") / 1000L).cast(LongType))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType   => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other")
    }
    raw.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** CSV source with a REQUIRED explicit schema and FAILFAST parsing.
    * Never `inferSchema` — inference is a full extra scan of the input
    * (ruinous at 100 TB) and silently guesses types per run; a declared
    * schema also lets Catalyst prune columns at the parser (CSV reads only
    * the fields the plan needs).
    */
  def csv(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    s.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  /** JSON-lines source, same contract as [[csv]]: explicit schema (skips
    * the inference scan, prunes unread fields during parsing), FAILFAST so
    * corrupt records surface instead of becoming silent nulls.
    */
  def jsonLines(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

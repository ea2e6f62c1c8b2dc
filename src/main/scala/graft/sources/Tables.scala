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

  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark 4 refuses to
    * read natively; read it as a nanos long and convert to a µs timestamp.
    * Truncation is safe for every second-aligned comparison: µs-truncating
    * a ns instant never crosses a µs-aligned boundary.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set at session
    * build (GraftSession.FixedConfs / Verify / Bench) — a loader must not
    * mutate session conf as a side effect.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build to read events.ts")
    val raw = load(s, d, "events")
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        (org.apache.spark.sql.functions.col("ts") / 1000L)
          .cast(org.apache.spark.sql.types.LongType)))
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

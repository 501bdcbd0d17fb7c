package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the test star schema (TESTDATA.md).
  *
  * `events.ts` has shipped in two parquet encodings across testdata
  * generations, both normalized here to a session-zone TimestampType so
  * every downstream query sees one shape:
  *   - INT64(NANOS): Spark has no ns timestamp, so with nanosAsLong the
  *     column reads as Long and is floored to a µs timestamp.
  *   - timestamp[us] (no zone): reads as TIMESTAMP_NTZ; cast to
  *     TimestampType — value-preserving under the UTC session timezone
  *     [[GraftSession]] pins.
  * The oracle side (DuckDB) applies `CAST(ts AS TIMESTAMP)`, a no-op /
  * equivalent truncation, so both engines see identical event times.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One DataSource resolution per (session, dir, table) — a LAZY plan
    * memo, not a result cache: nothing is materialized, every action
    * still scans the parquet. `spark.read.parquet` eagerly reads the
    * footer and lists the path on EVERY call (measured 77 ms per load
    * at sf0.1 — with 1-3 table loads per query over a 207-query bench
    * run this was the single largest slice of the per-query floor), and
    * at corpus scale re-listing a many-thousand-file table per query is
    * exactly the repeated-listing cost guide §6 warns about (Spark's
    * own catalog tables persist their FileIndex for the same reason).
    * Keyed by applicationId via [[graft.queries.SharedFrames]] (the
    * Shared* discipline); the static test tables never change under a
    * running app, and store-read gates build/read their own per-call
    * tmp paths directly, never through this.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.queries.SharedFrames.cached(spark, s"table:$name", dir)(
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet")))(_ => ())

  /** Normalize a `ts` column (either stored encoding — see class doc) to
    * TimestampType. Public so streaming readers over the same parquet
    * (ParitySpec's file-stream replay, StreamBench) share one rule.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      // nanosAsLong leaves ns-precision columns as Long: convert to µs ts.
      if (f.name == "ts" && f.dataType == LongType)
        acc.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else if (f.name == "ts" && f.dataType == TimestampNTZType)
        acc.withColumn("ts", col("ts").cast("timestamp"))
      else acc
    }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's TPC-H-ish test tables (TESTDATA.md).
  *
  * Scale notes (the 100 TB story):
  *   - Fact tables (`lineitem`, `orders`, `events`, `documents`,
  *     `embeddings`) are read with only the columns the query needs —
  *     all queries select before shuffling, so parquet column pruning
  *     and predicate pushdown apply (verify via `PushedFilters` in
  *     `.explain("formatted")`).
  *   - Dimension tables (`region`, `nation`, `supplier`, `customer`,
  *     `part`) stay small relative to facts at every SF (they grow
  *     linearly but stay orders of magnitude below `lineitem`), so
  *     joins against them are marked broadcast-able at the call sites.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** `events.ts` normalized to a session-TZ (UTC) µs TIMESTAMP whatever
    * physical type the generator wrote:
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; with
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    *     [[graft.GraftSession]]) it arrives as LONG nanoseconds and we
    *     restore a native µs TIMESTAMP (truncation to micros matches
    *     Spark's own precision). Integer `div`, NOT `/`: long/long in
    *     Spark is DOUBLE division, and nano-epoch values exceed double
    *     precision (ulp 256ns) — the lossy round-then-truncate
    *     corrupted ~1.6% of timestamps by 1µs.
    *   - timestamp[us] not adjusted to UTC: arrives TIMESTAMP_NTZ; the
    *     session TZ is pinned to UTC so the NTZ→LTZ cast is
    *     value-preserving (same micros, same rendering as the
    *     DuckDB-side naive read).
    *   - timestamp[us] UTC-adjusted: already TimestampType, no-op.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
}

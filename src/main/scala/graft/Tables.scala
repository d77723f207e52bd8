package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All operators take the scale-factor directory as a parameter so the same
  * plan runs unchanged at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench)
  * — and, on a real cluster, against a 100 TB lake path. Reads are plain
  * `spark.read.parquet` so Catalyst handles column pruning and filter
  * pushdown into the scan.
  */
object Tables {
  /** Memoized per (session, dir, table): `spark.read.parquet` re-lists the
    * files and re-reads the parquet footer schema on every call — a driver
    * job per table per query. Resolving each table once per session is the
    * catalog-table behavior a deployed lake would have. NOTE the cached
    * plan pins the file listing (its `InMemoryFileIndex` snapshot) as well
    * as the schema: a dir whose files are rewritten mid-session must be
    * flushed with [[clearResolved]] (as a catalog would REFRESH TABLE).
    */
  private val resolved =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    resolved.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))

  /** Forget every resolved table (the REFRESH TABLE analog) — call after
    * rewriting parquet files under a dir already read this session.
    */
  def clearResolved(): Unit = resolved.clear()

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` normalizes to a µs TimestampType whatever the generator
    * wrote, so every consumer (and the `unix_micros`/`epoch_us` oracle
    * convention) sees one type across testdata generations:
    *  - parquet TIMESTAMP(NANOS) (earlier generations) — Spark's
    *    TimestampType (µs) cannot hold it; read as a raw nanos long and
    *    floor-truncate. DuckDB oracles mirror with
    *    `date_trunc('microseconds', ts)` / `epoch_us(ts)` (µs no-ops).
    *  - parquet timestamp[us] with isAdjustedToUTC=false (current
    *    generation) — Spark reads TIMESTAMP_NTZ; cast to TimestampType,
    *    exact because sessions pin spark.sql.session.timeZone=UTC
    *    ([[Sessions]]), matching DuckDB's naive reading.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** The per-generation `ts` dispatch of [[events]], shared with the
    * streaming file-source path (which reads the same parquet through
    * `readStream` and must apply the identical normalization).
    *
    * Documented TIMESTAMP DOMAIN contract (cross-engine date strings):
    * operators that emit formatted dates (q_daily_stats, q_global_stats,
    * q_rollup_events, q_coverage_gaps, ...) pair Spark's
    * date_format('yyyy-MM-dd') with DuckDB's strftime('%Y-%m-%d'),
    * which agree for years 1–9999 (both zero-pad below 1000 — verified)
    * but DIVERGE outside: Java's EXCEEDS_PAD prints '+10000-…' for year
    * ≥ 10000 and 'yyyy' is year-of-era for pre-AD-1. A lake with
    * corrupt far-out timestamps should gate them at ingest
    * (q_quality_metrics' ts-bounds rule is the place); within the
    * documented domain the string cells are identical.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // FLOOR division in exact integer arithmetic: DIV truncates toward
        // zero, which for a pre-epoch (negative-ns) timestamp lands one µs
        // off the oracle's date_trunc/epoch_us floor; pmod is non-negative
        // so subtracting it floors. (floor(ts/1000.0) would lose precision
        // — ns values exceed a double's 2^53 integer range.)
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // already a µs TimestampType
    }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) cannot hold — read it as a raw nanos long and floor-truncate to a
    * µs timestamp. DuckDB oracles mirror this with
    * `date_trunc('microseconds', ts)` / `epoch_us(ts)`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // FLOOR division in exact integer arithmetic: DIV truncates toward
    // zero, which for a pre-epoch (negative-ns) timestamp lands one µs off
    // the oracle's date_trunc/epoch_us floor; pmod is non-negative so
    // subtracting it floors. (floor(ts/1000.0) would lose precision — ns
    // values exceed a double's 2^53 integer range.)
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

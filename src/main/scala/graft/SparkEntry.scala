package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7.
  *
  * Every operator in the SURVEY §2 inventory registers a [[Q]] here; SQL-
  * expressible ones also carry a DuckDB oracle with matching column aliases
  * (the driver sorts columns by name and hash-compares values).
  */
object SparkEntry {

  /** All registered operators, grouped by module. */
  def registry: Seq[Q] =
    operators.Relational.all ++ operators.Profiling.all ++
      operators.Ingest.all ++ operators.Temporal.all ++
      operators.Labeling.all ++ operators.TextOps.all ++
      operators.Similarity.all ++ operators.Multimodal.all ++
      operators.TopK.all ++ operators.Curation.all ++ operators.Assembly.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.qStarRollup.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

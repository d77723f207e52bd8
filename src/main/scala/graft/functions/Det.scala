package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic, order-independent aggregation helpers.
  *
  * Why: `SUM(double)` is order-dependent, so a 32-thread Spark shuffle and a
  * single-threaded DuckDB oracle (and, at scale, two different cluster runs)
  * can disagree in the low bits. The fix used throughout graft: round each
  * row to a fixed scale, convert to exact decimal, sum decimals (exact and
  * associative at ANY parallelism), and cast the final total back to double.
  * The oracle SQL mirrors the same expression, so results are bit-identical
  * regardless of partitioning — the property that makes these aggregates
  * safe on a 1000-executor cluster.
  */
object Det {

  /** Exact, order-independent sum of a double column (row-rounded at `scale`). */
  def exactSum(c: Column, scale: Int = 4): Column =
    sum(round(c, scale).cast(DecimalType(18, scale))).cast("double")

  /** SQL mirror of [[exactSum]] for the DuckDB oracle. */
  def exactSumSql(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(ROUND($expr, $scale) AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Deterministic mean of a double column, rounded to `r` decimals. */
  def exactAvg(c: Column, r: Int = 2, scale: Int = 4): Column =
    round(exactSum(c, scale) / count(lit(1)), r)

  def exactAvgSql(expr: String, r: Int = 2, scale: Int = 4): String =
    s"ROUND(${exactSumSql(expr, scale)} / COUNT(*), $r)"

  /** Deterministic mean of an integer column (exact long sum / count). */
  def intAvg(c: Column, r: Int = 2): Column =
    round(sum(c).cast("double") / count(lit(1)), r)

  def intAvgSql(expr: String, r: Int = 2): String =
    s"ROUND(CAST(SUM($expr) AS DOUBLE) / COUNT(*), $r)"
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator/query: the Spark plan builder plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query used by
  * the driver's correctness gate. Column aliases MUST match between the two.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}

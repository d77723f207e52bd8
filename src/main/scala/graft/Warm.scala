package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time JVM warm-up helpers shared by the driver mains. */
object Warm {

  /** Pre-pay the ICU case-mapping initialization. The first task that
    * evaluates `lower()`/`upper()` under the default collation loads
    * `CollationAwareUTF8String` — a JVM-global static init that builds the
    * ICU case maps (seconds of CPU, worse on a cold file cache) while every
    * sibling task blocks on the class-init lock. Running one tiny job here
    * moves that cost out of the first real query; on a multi-executor
    * cluster the same line belongs in an executor-startup hook.
    */
  def icu(spark: SparkSession): Unit =
    spark.range(1)
      .select(lower(lit("Aİ ß")), upper(lit("ıa ß")), initcap(lit("ß x")))
      .count()
}

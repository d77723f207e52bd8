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
  def icu(spark: SparkSession): Unit = {
    // the case expressions must (a) depend on a non-constant column and
    // (b) feed the aggregate — a bare count() lets ColumnPruning delete a
    // foldable projection before it ever evaluates, skipping the init
    val s = concat(
      lower(concat(lit("Aİ ß"), col("id"))),
      upper(concat(lit("ıa ß"), col("id"))),
      initcap(concat(lit("ß x"), col("id"))))
    spark.range(8).select(s.as("s")).agg(max(length(col("s")))).collect()
    ()
  }
}

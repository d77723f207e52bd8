package graft

import org.apache.spark.sql.SparkSession

/** The one SparkSession recipe every driver main shares. Verify and Bench
  * MUST run under identical semantics — correctness validated under one
  * config and performance measured under another would be meaningless —
  * so the builder lives in exactly one place.
  */
object Sessions {

  def build(cores: String, shufflePartitions: String): SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // split size matched to the lake layout (SURVEY §4): the testdata
      // convention is ONE parquet file per table, so scan parallelism
      // comes from intra-file splits at row-group boundaries — with the
      // 128 MB default a 107 MB sf1 lineitem reads as ONE task and every
      // scan-bound operator serializes on one core, which a real cluster
      // (thousands of files) never does. 16 MB matches GenData's
      // row-group size; sub-16 MB files still read as one task each.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** SPARK_GRAFT_CPUS-sized session (default local[32], 32 shuffle parts). */
  def buildDefault(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    build(cpus, cpus)
  }
}

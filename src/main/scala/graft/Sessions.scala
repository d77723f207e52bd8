package graft

import org.apache.spark.sql.SparkSession

/** The one SparkSession recipe every driver main shares. Verify and Bench
  * MUST run under identical semantics — correctness validated under one
  * config and performance measured under another would be meaningless —
  * so the builder lives in exactly one place.
  */
object Sessions {

  def build(cores: String, shufflePartitions: String): SparkSession = {
    val b = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
    // SPARK_GRAFT_INIT_PARTITIONS (opt-in, study knob): AQE wide-start.
    // At sf10 the ANN collision joins push ~5e9 narrow rows through a
    // shuffle; at the fixed 32 partitions that is ~4 GB/partition — a
    // spill regime sf≤1 never enters, invisible to every smaller study.
    // Starting shuffles at N initial partitions and letting AQE coalesce
    // the small ones back down is the cluster-shaped answer (a real
    // deployment runs thousands of initial partitions); unset, the
    // session is bit-identical to the driver protocol.
    val withInit = sys.env.get("SPARK_GRAFT_INIT_PARTITIONS")
      .flatMap(v => scala.util.Try(v.toInt).toOption).filter(_ > 0)
      .fold(b)(n => b.config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", n.toString))
    val s = withInit
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

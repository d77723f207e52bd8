package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual named queries. Usage:
  * runMain graft.QTime <sfDir> <name> [name...]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Warm.icu(spark)
    SparkEntry.entry(spark).count() // warmup
    args.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[qtime] $n rows=$c ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

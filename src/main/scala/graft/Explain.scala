package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of the named
  * queries (all queries when no args) at the given SF. Used to check the
  * SURVEY §4 scale rules: broadcast joins for dims, PushedFilters/pruned
  * ReadSchema at the scans, WholeStageCodegen coverage, no stray shuffles.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.build("4", "4")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

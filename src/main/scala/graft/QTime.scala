package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual named queries (through the same noop-sink
  * full evaluation Bench uses — a count() would let Catalyst prune the
  * aggregate expressions being timed). Usage:
  * runMain graft.QTime <sfDir> <name> [name...]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.buildDefault()
    Warm.icu(spark)
    SparkEntry.entry(spark).count() // warmup
    args.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[qtime] $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

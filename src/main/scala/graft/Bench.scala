package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the SF dir given by
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup pass (flagship
  * star-rollup + one tiny scan per table) runs first so timings measure
  * steady-state plans, not JIT/classloading of the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: exercise scans, shuffle, broadcast, window, HOF and codegen
    // machinery once (at the smallest SF for the heavier paths) so the
    // timed loop below measures steady-state execution, not JIT
    // each step in its own guard: one failing warm-up (e.g. the raw events
    // read before the nanos conf is set) must not silently skip the rest
    def warm(step: => Unit): Unit = try step catch { case _: Throwable => }
    warm(Warm.icu(spark))
    warm(SparkEntry.entry(spark).count())
    Seq("lineitem", "orders", "documents", "embeddings")
      .foreach(t => warm(Tables.table(spark, sfDir, t).count()))
    warm(Tables.events(spark, sfDir).count())
    Seq("q_ngram_jaccard", "q_cosine_topk", "q_dedup_simhash", "q_dedup_minhash",
      "q_dedup_clusters", "q_dedup_exact", "q_ann_lsh", "q_ann_ivf", "q_agreement")
      .foreach(q => warm(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()))
    // the warm-up pinned sf0.001 similarity indexes the timed loop never
    // reads — release that storage memory before timing the sf0.1 builds
    graft.operators.Similarity.clearIndexCache()

    // a failed query reports -1, never a bogus elapsed time
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val secs = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Exception =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0 }
      name -> secs
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
